"""Multi-host scaling harness (BASELINE: >=85% tokens/s scaling 1->2 hosts).

The sandbox has ONE TPU chip, so real 2-host numbers cannot be produced
here — but everything needed for the measurement is prepared and exercised:

  * emulation mode (default): spawns N real OS processes on the CPU backend,
    brings them up with `jax.distributed.initialize` (a real coordinator +
    cross-process collectives over TCP — the DCN stand-in), builds the
    DCN-aware hybrid mesh (parallel.mesh.make_hybrid_mesh: `model` within a
    host, `data` across hosts), shards a quantized llama decode step over
    it, and measures per-host step throughput at 1 host and N hosts. The
    printed `scaling` is the cross-host efficiency of the identical SPMD
    program the real measurement would run.
  * real mode (`--real`, run ON EACH HOST of a v5e pod): same program, no
    subprocess spawning — JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/
    JAX_PROCESS_ID (or TPU metadata) select the pod topology, the mesh puts
    TP over ICI and data over DCN, and host 0 prints the scaling JSON
    against a recorded single-host baseline (--baseline-toks).

Run:  python scripts/scaling_bench.py [--hosts 2] [--devices-per-host 4]
"""
import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(args):
    """One emulated host: distributed bring-up + sharded decode steps."""
    import jax

    if not args.real:
        jax.config.update("jax_num_cpu_devices", args.devices_per_host)
    if args.hosts > 1:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.hosts,
            process_id=args.process_id,
        )
    import jax.numpy as jnp
    import numpy as np

    from ggmlsharp_tpu import GType
    from ggmlsharp_tpu.models import llama, sampling
    from ggmlsharp_tpu.parallel import sharding as shd
    from ggmlsharp_tpu.parallel.mesh import make_hybrid_mesh

    mesh = make_hybrid_mesh(model_per_host=args.devices_per_host)
    cfg = llama.LlamaConfig(
        n_vocab=512, n_ctx=512, n_embd=256, n_head=8, n_head_kv=4,
        n_layer=4, n_ff=512,
    )
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    if args.real:
        # TP shards the (N, .)-oriented planes; swar stays off (see dryrun)
        qparams = llama.quantize_params(params, GType.Q4_0, swar=False)
    else:
        # emulation: bf16 weights — identical mesh/sharding/collectives,
        # but no interpret-mode Pallas (50-90 s/step under multiprocess
        # CPU; the quantized kernel path is dryrun/TPU-smoke territory)
        qparams = llama.fuse_params(params)
    with mesh:
        qparams = shd.shard_params(qparams, shd.llama_param_specs(), mesh)
        # data axis shards batch slots across hosts
        B = args.batch_per_host * mesh.shape["data"]
        # head-major cache: kv_cache_spec shards KV heads over `model`
        # (the flat [B, T, E] layout is the single-chip decode fast path)
        cache = llama.new_cache(cfg, B, flat=False)
        cache = shd.shard_cache(cache, shd.kv_cache_spec(), mesh)
        prompt = jnp.ones((B, 8), jnp.int32)
        prefill, step = sampling.make_decode_fns(llama.forward, cfg)
        t_eff = sampling.length_bucket(8 + 4 + args.steps, cfg.n_ctx)
        logits, cache = prefill(qparams, prompt, cache, t_eff=t_eff)
        tok = jnp.argmax(logits, axis=-1, keepdims=True).astype(jnp.int32)
        for _ in range(3):  # warmup
            tok, cache = step(qparams, tok, cache, t_eff=t_eff)
        np.asarray(tok.addressable_shards[0].data)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            tok, cache = step(qparams, tok, cache, t_eff=t_eff)
        np.asarray(tok.addressable_shards[0].data)
        dt = time.perf_counter() - t0
    toks = args.steps * B / dt
    if jax.process_index() == 0:
        print(json.dumps({
            "hosts": args.hosts, "devices": jax.device_count(),
            "batch": B, "tokens_per_s": round(toks, 1),
        }), flush=True)
    return toks


def worker_serve(args):
    """One serving host: an independent tensor-parallel Engine over the
    host's local devices (DP serving is embarrassingly parallel — each
    host feeds its own slots, params replicated per host, no cross-host
    collectives; this IS the deployment shape the engine docstring
    promises: "each host feeds its data-shard slots")."""
    import jax

    if not args.real:
        jax.config.update("jax_num_cpu_devices", args.devices_per_host)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from ggmlsharp_tpu.models import llama
    from ggmlsharp_tpu.parallel import sharding as shd
    from ggmlsharp_tpu.serving import Engine, Request

    cfg = llama.LlamaConfig(
        n_vocab=512, n_ctx=512, n_embd=256, n_head=8, n_head_kv=4,
        n_layer=4, n_ff=512,
    )
    params = llama.fuse_params(
        llama.init_params(jax.random.PRNGKey(0), cfg))
    mesh = Mesh(np.array(jax.devices()), ("model",))
    params = shd.shard_params(params, shd.llama_param_specs(), mesh)
    eng = Engine(llama.forward, cfg, params,
                 batch_slots=args.batch_per_host, mesh=mesh)
    rng = np.random.default_rng(1234 + args.process_id)
    prompts = [rng.integers(0, cfg.n_vocab, size=8).tolist()
               for _ in range(args.batch_per_host * 3)]
    # warmup: compile prefill groups + step
    for i in range(args.batch_per_host):
        eng.submit(Request(id=-1 - i, prompt=prompts[i], max_new_tokens=2))
    eng.run()
    for i, p in enumerate(prompts):
        eng.submit(Request(id=i, prompt=p, max_new_tokens=args.steps))
    t0 = time.perf_counter()
    results = eng.run()
    dt = time.perf_counter() - t0
    toks = sum(len(r.out_tokens) for r in results if r.id >= 0) / dt
    print(json.dumps({
        "host": args.process_id, "devices": jax.device_count(),
        "slots": args.batch_per_host, "tokens_per_s": round(toks, 1),
    }), flush=True)
    return toks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hosts", type=int, default=2)
    ap.add_argument("--devices-per-host", type=int, default=4)
    ap.add_argument("--batch-per-host", type=int, default=4)
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--real", action="store_true",
                    help="run on a real pod host (no emulation spawn)")
    ap.add_argument("--baseline-toks", type=float, default=0.0)
    ap.add_argument("--coordinator", default="127.0.0.1:8476")
    ap.add_argument("--serve", action="store_true",
                    help="continuous-batching scaling: one independent "
                         "TP Engine per host (DP serving)")
    ap.add_argument("--process-id", type=int,
                    default=int(os.environ.get("JAX_PROCESS_ID", "-1")))
    args = ap.parse_args()

    if args.process_id >= 0 or args.real:
        (worker_serve if args.serve else worker)(args)
        return

    def launch(hosts, collect_all=False):
        """Spawn `hosts` emulated-host processes; return host-0 JSON (or
        every host's JSON with collect_all)."""
        env = dict(os.environ)
        env.update(PYTHONPATH=REPO, JAX_PLATFORMS="cpu",
                   TF_CPP_MIN_LOG_LEVEL="2")
        env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        procs = []
        for pid in range(hosts):
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--hosts", str(hosts),
                   "--devices-per-host", str(args.devices_per_host),
                   "--batch-per-host", str(args.batch_per_host),
                   "--steps", str(args.steps),
                   "--coordinator", args.coordinator,
                   "--process-id", str(pid)] \
                + (["--serve"] if args.serve else [])
            procs.append(subprocess.Popen(
                cmd, env=env, stdout=subprocess.PIPE,
                stderr=subprocess.PIPE, text=True))
        # emulated hosts are compile-dominated on a cold cache; a 2-host
        # rendezvous alone can take >10 min on a fresh machine
        tmo = int(os.environ.get("SCALING_PROC_TIMEOUT", "1800"))
        outs, errs = zip(*(p.communicate(timeout=tmo) for p in procs))
        if any(p.returncode != 0 for p in procs):
            sys.stderr.write(errs[0][-2000:])
            raise SystemExit([p.returncode for p in procs])
        # the decode worker prints JSON on process 0 only; worker_serve on
        # every host — collect whatever JSON lines exist, error if none
        rows = []
        for o, e in zip(outs, errs):
            line = next((ln for ln in o.splitlines()
                         if ln.startswith("{")), None)
            if line is not None:
                rows.append(json.loads(line))
        if not rows:
            sys.stderr.write("worker stdout tail: %r\n" % outs[0][-500:])
            sys.stderr.write("worker stderr tail: %s\n" % errs[0][-2000:])
            raise SystemExit("no scaling worker produced JSON")
        return rows if collect_all else rows[0]

    if args.serve:
        one = launch(1, collect_all=True)
        many = launch(args.hosts, collect_all=True)
        agg = sum(r["tokens_per_s"] for r in many)
        scaling = agg / (one[0]["tokens_per_s"] * args.hosts)
        print(json.dumps({
            "metric": f"continuous-batching serving, 1 and {args.hosts} "
                      "emulated hosts (independent TP engines, DP slots)",
            "one_host": one[0], "multi_host_aggregate": round(agg, 1),
            "per_host": many,
            "emulated_scaling": round(scaling, 3),
            "note": "per-host engines share nothing — cross-host serving "
                    "scaling is bounded only by host CPU contention here; "
                    "run with --serve --real per pod host for hardware "
                    "numbers",
        }))
        return

    one = launch(1)
    many = launch(args.hosts)
    scaling = many["tokens_per_s"] / (one["tokens_per_s"] * args.hosts)
    print(json.dumps({
        "metric": f"multi-host bring-up + SPMD decode, 1 and {args.hosts} "
                  "emulated hosts (CPU)",
        "one_host": one, "multi_host": many,
        "emulated_scaling": round(scaling, 3),
        "note": "emulated ratio is gloo-latency-bound on a toy model — it "
                "validates the bring-up/mesh/program, not efficiency; run "
                "with --real on each pod host for the BASELINE >=85% "
                "measurement",
    }))


if __name__ == "__main__":
    main()
