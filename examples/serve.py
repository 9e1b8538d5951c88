"""Continuous-batching serving demo: mixed workload through the Engine.

    python examples/serve.py [--slots 4] [--requests 12] [--int8-kv] \
        [--draft] [--prefix] [--top-p 0.9] [--penalty 1.3] [--stream]

--draft: speculative continuous batching — a second (here: differently
seeded) model drafts k tokens per tick, the target verifies them in one
forward; greedy requests are bit-identical to plain greedy, sampled ones
ride rejection sampling (distributed exactly as the target alone).
--prefix: register a shared system prompt once and reuse its KV across
requests. --top-p / --penalty exercise the nucleus / repetition-penalty
sampler stack; --stream prints per-token callback output as it lands.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=4)
    ap.add_argument("--requests", type=int, default=12)
    ap.add_argument("--int8-kv", action="store_true")
    ap.add_argument("--draft", action="store_true",
                    help="speculative decoding (greedy-exact)")
    ap.add_argument("--prefix", action="store_true",
                    help="share a cached system-prompt prefix")
    ap.add_argument("--top-p", type=float, default=1.0)
    ap.add_argument("--penalty", type=float, default=1.0,
                    help="repetition penalty over the last 64 tokens")
    ap.add_argument("--stream", action="store_true",
                    help="print tokens from the on_token callback")
    args = ap.parse_args()

    from ggmlsharp_tpu.dtypes import GType
    from ggmlsharp_tpu.models import gpt2
    from ggmlsharp_tpu.serving import Engine, Request

    cfg = gpt2.GPT2_124M
    params = gpt2.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    params = jax.jit(lambda p: gpt2.quantize_params(p, GType.Q8_0))(params)

    spec = {}
    if args.draft:
        draft = gpt2.init_params(jax.random.PRNGKey(9), cfg,
                                 dtype=jnp.bfloat16)
        draft = jax.jit(lambda p: gpt2.quantize_params(p, GType.Q8_0))(draft)
        spec = dict(draft_forward=gpt2.forward, draft_cfg=cfg,
                    draft_params=draft, spec_k=4)
    eng = Engine(gpt2.forward, cfg, params, batch_slots=args.slots,
                 cache_dtype=jnp.bfloat16, int8_kv=args.int8_kv, **spec)
    pid = eng.register_prefix([50, 51, 52, 53, 54, 55]) if args.prefix \
        else None
    for i in range(args.requests):
        eng.submit(Request(
            id=i,
            prompt=(([50, 51, 52, 53, 54, 55] if pid is not None else [])
                    + list(range(1, 2 + i % 7))),
            max_new_tokens=16 + 8 * (i % 3),
            temperature=0.7 if i % 2 else 0.0,
            top_k=40 if i % 2 else 0,
            top_p=args.top_p,
            repeat_penalty=1.0 if args.draft else args.penalty,
            prefix_id=pid,
            on_token=(lambda r, t: print(f"  [stream] req {r.id} -> {t}"))
            if args.stream else None,
        ))
    t0 = time.time()
    results = eng.run()
    dt = time.time() - t0
    total = sum(len(r.out_tokens) for r in results)
    print(f"served {len(results)} requests, {total} tokens in {dt:.2f}s")
    print(f"engine stats: {eng.stats()}")
    for r in results[:3]:
        print(f"  req {r.id}: {r.out_tokens[:10]}...")


if __name__ == "__main__":
    main()
