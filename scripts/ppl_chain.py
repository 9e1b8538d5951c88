"""End-to-end perplexity chain (VERDICT r3 #5): train -> GGUF -> reload ->
tokenize -> perplexity, all through the repo's own machinery.

  1. train a small llama on the COMMITTED corpus (tests/data/tiny_corpus.txt)
     with the repo's own Adam (optim.opt_adam, full-batch NLL — the
     reference-parity optimizer, not optax);
  2. train an SPM vocab on the same corpus (io.tokenizer.train_spm_vocab)
     and export model + tokenizer as ONE self-contained GGUF
     (io.gguf.save_gguf_llama(tokenizer=...));
  3. reload the GGUF (io.gguf.load_gguf_llama + io.tokenizer.from_gguf),
     re-tokenize the corpus FROM THE FILE's vocab, and measure perplexity
     of the reloaded fp32 weights and of Q8_0/Q4_0/Q4_K/Q6_K quantized
     copies (models.llama.quantize_params) with eval.perplexity.

The absolute ppl is that of a small model on a synthetic corpus; the
COMMITTED artifact is the Δppl column — the BASELINE config-2 quantity
(Δppl fp32->quantized), measured through the exact pipeline (GGUF wire
blocks, ggml quantization semantics, real tokenizer) a pretrained
checkpoint would ride. Writes docs/PPL_CHAIN.md.

Run: env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python scripts/ppl_chain.py
(CPU; ~5-10 min. PPL_STEPS/PPL_SIZE env to shrink.)
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo/")

import jax
import jax.numpy as jnp
import numpy as np


def log(m):
    print(m, flush=True)


def main():
    from ggmlsharp_tpu.dtypes import GType
    from ggmlsharp_tpu.eval.perplexity import perplexity
    from ggmlsharp_tpu.io.gguf import GGUFReader, load_gguf_llama, \
        save_gguf_llama
    from ggmlsharp_tpu.io.tokenizer import SPMTokenizer, from_gguf, \
        train_spm_vocab
    from ggmlsharp_tpu.models import llama
    from ggmlsharp_tpu.optim import AdamParams, OptParams, opt_adam

    t0 = time.time()
    steps = int(os.environ.get("PPL_STEPS", "400"))
    vocab_size = int(os.environ.get("PPL_VOCAB", "512"))
    here = os.path.dirname(os.path.abspath(__file__))
    corpus_path = os.path.join(here, "..", "tests", "data",
                               "tiny_corpus.txt")
    text = open(corpus_path).read()

    # --- tokenizer: trained on the corpus, repo machinery ---------------
    tokens, scores = train_spm_vocab(text, size=vocab_size)
    tk = SPMTokenizer(tokens, scores)
    ids = np.asarray(tk.encode(text), np.int32)
    log(f"vocab={len(tokens)} corpus={len(ids)} tokens "
        f"({len(text)} chars, {len(ids)/len(text.split()):.2f} tok/word)")

    S = 128
    n_chunk = (len(ids) - 1) // S
    X = jnp.asarray(ids[: n_chunk * S].reshape(n_chunk, S))
    Y = jnp.asarray(ids[1 : n_chunk * S + 1].reshape(n_chunk, S))

    size = os.environ.get("PPL_SIZE", "small")
    dims = {"tiny": (2, 128, 4, 256), "small": (4, 192, 6, 512)}[size]
    n_layer, n_embd, n_head, n_ff = dims
    cfg = llama.LlamaConfig(
        n_vocab=len(tokens), n_ctx=256, n_embd=n_embd, n_head=n_head,
        n_head_kv=n_head, n_layer=n_layer, n_ff=n_ff)
    params = llama.init_params(jax.random.PRNGKey(0), cfg,
                               dtype=jnp.float32)

    from ggmlsharp_tpu.models import kv_cache as kvc

    def nll(p):
        cache = kvc.init_cache(cfg.n_layer, n_chunk, cfg.n_head_kv, S,
                               cfg.head_dim, dtype=jnp.float32)
        pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None],
                               (n_chunk, S))
        logits, _ = llama.forward(p, cfg, X, cache, pos)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        return -jnp.take_along_axis(lp, Y[..., None], -1).mean()

    fun_vg = jax.value_and_grad(nll)
    p0 = float(nll(params))
    log(f"init nll={p0:.3f} (ppl {np.exp(p0):.1f}; uniform would be "
        f"{np.log(len(tokens)):.3f}) at t={time.time()-t0:.0f}s")

    op = OptParams(adam=AdamParams(alpha=3e-3, n_iter=steps),
                   past=0, max_no_improvement=0)
    params, f, res, it = opt_adam(fun_vg, params, op)
    log(f"trained {it} Adam iters -> nll={f:.3f} (ppl {np.exp(f):.1f}) "
        f"at t={time.time()-t0:.0f}s [{res}]")

    # --- export one self-contained GGUF, reload, re-tokenize ------------
    out = "/tmp/ppl_chain_model.gguf"
    save_gguf_llama(out, cfg, params, tokenizer=tk)
    cfg2, params2 = load_gguf_llama(out)
    tk2 = from_gguf(GGUFReader(out))
    ids2 = np.asarray(tk2.encode(text), np.int32)
    assert np.array_equal(ids2, ids), "GGUF-carried vocab must round-trip"
    params2 = jax.tree.map(jnp.asarray, params2)
    log(f"GGUF round-trip ok ({os.path.getsize(out)/1e6:.1f} MB, "
        f"vocab+weights) at t={time.time()-t0:.0f}s")

    rows = []
    ppl_fp, _, n_scored = perplexity(llama.forward, cfg2, params2, ids2,
                                     chunk_len=S)
    rows.append(("fp32 (GGUF reload)", ppl_fp, 0.0))
    log(f"fp32 ppl={ppl_fp:.4f} over {n_scored} scored tokens")
    for name, gt in [("Q8_0", GType.Q8_0), ("Q4_0", GType.Q4_0),
                     ("Q4_K", GType.Q4_K), ("Q6_K", GType.Q6_K)]:
        qp = llama.quantize_params(params2, gt, cfg=cfg2)
        ppl_q, _, _ = perplexity(llama.forward, cfg2, qp, ids2,
                                 chunk_len=S)
        rows.append((name, ppl_q, ppl_q - ppl_fp))
        log(f"{name} ppl={ppl_q:.4f}  dppl={ppl_q-ppl_fp:+.4f}")

    doc = os.path.join(here, "..", "docs", "PPL_CHAIN.md")
    with open(doc, "w") as fh:
        fh.write(
            "# Perplexity chain (measured end-to-end)\n\n"
            "Full pipeline on the committed corpus "
            "(`tests/data/tiny_corpus.txt`):\n"
            "repo Adam training -> `io.gguf.save_gguf_llama` (weights + "
            "SPM vocab in one file) ->\n`load_gguf_llama` + "
            "`io.tokenizer.from_gguf` -> re-tokenize from the file's "
            "vocab ->\n`eval.perplexity`. Regenerate: `env "
            "PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python "
            "scripts/ppl_chain.py`.\n\n"
            f"Model: llama {n_layer}L/{n_embd}E/{n_ff}F, vocab "
            f"{len(tokens)}, trained {it} full-batch Adam iters to "
            f"nll {f:.3f}; {n_scored} scored tokens.\n\n"
            "| Params | ppl | dppl vs fp32 |\n|---|---|---|\n")
        for name, p, d in rows:
            fh.write(f"| {name} | {p:.4f} | {d:+.4f} |\n")
        fh.write(
            "\nThe corpus is synthetic (zero-egress sandbox; see "
            "scripts/gen_corpus.py), so absolute ppl is not WikiText-2 — "
            "the dppl column is the BASELINE config-2 quantity measured "
            "through the exact pipeline (ggml wire blocks, ggml "
            "quantization semantics, real tokenizer) a pretrained "
            "checkpoint would use. BASELINE bound: dppl <= 0.1.\n")
    log(f"wrote {doc} at t={time.time()-t0:.0f}s")


if __name__ == "__main__":
    main()
