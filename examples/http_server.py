"""Serve a quantized model over HTTP (llama.cpp-`server`-style JSON API).

    python examples/http_server.py [--port 8080] [--slots 4]

then:
    curl -s localhost:8080/v1/generate -d '{"prompt": [1,2,3],
        "max_new_tokens": 16, "temperature": 0.7, "top_p": 0.9}'
    curl -s localhost:8080/v1/stats
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
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--slots", type=int, default=4)
    args = ap.parse_args()

    from ggmlsharp_tpu.dtypes import GType
    from ggmlsharp_tpu.models import gpt2
    from ggmlsharp_tpu.serving import Engine, EngineServer

    cfg = gpt2.GPT2_124M
    params = gpt2.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    params = jax.jit(lambda p: gpt2.quantize_params(p, GType.Q8_0))(params)
    eng = Engine(gpt2.forward, cfg, params, batch_slots=args.slots,
                 cache_dtype=jnp.bfloat16)
    srv = EngineServer(eng, port=args.port).start()
    print(f"serving on http://127.0.0.1:{srv.port} "
          f"(slots={args.slots}); ctrl-c to stop", flush=True)
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        srv.stop()


if __name__ == "__main__":
    main()
