"""Emulated scaling-curve artifact (VERDICT r4 #7): run
scripts/scaling_bench.py at N in {1,2,4,8} emulated hosts and commit the
curve to docs/SCALING.md each round, so the 2-host BASELINE claim has a
tracked proxy and regressions in the sharded decode path are visible.

The emulation is real jax.distributed over TCP (gloo as the DCN
stand-in) on the CPU backend — the ratio is transport-latency-bound on a
toy model, so the artifact reports, per N: aggregate tokens/s, per-host
step time, and the non-compute fraction 1 - t1/tN (collective + sync
share of the step, the quantity ICI/DCN overlap must hide on hardware).

Run: python scripts/gen_scaling_doc.py   (CPU only; ~3-6 min)
Env: SCALING_HOSTS ("1,2,4,8"), SCALING_DEV_PER_HOST (2), SCALING_STEPS.
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(hosts: int, dev: int, steps: int, batch: int) -> dict:
    env = dict(os.environ)
    env.update(PYTHONPATH=REPO, JAX_PLATFORMS="cpu",
               TF_CPP_MIN_LOG_LEVEL="2")
    cmd = [sys.executable, os.path.join(REPO, "scripts/scaling_bench.py"),
           "--hosts", str(hosts), "--devices-per-host", str(dev),
           "--steps", str(steps), "--batch-per-host", str(batch)]
    out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                         timeout=int(os.environ.get("SCALING_TIMEOUT",
                                                    "2400")))
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-2000:])
        raise SystemExit(out.returncode)
    line = next(ln for ln in out.stdout.splitlines() if ln.startswith("{"))
    return json.loads(line)


def main():
    hosts_list = [int(h) for h in
                  os.environ.get("SCALING_HOSTS", "1,2,4,8").split(",")]
    dev = int(os.environ.get("SCALING_DEV_PER_HOST", "2"))
    steps = int(os.environ.get("SCALING_STEPS", "16"))
    batch = int(os.environ.get("SCALING_BATCH_PER_HOST", "4"))
    t0 = time.time()
    rows = []
    for h in hosts_list:
        r = run_one(h, dev, steps, batch)
        # scaling_bench prints either a single-host row or the 1-vs-N
        # comparison object; normalize to the N-host measurement
        meas = r.get("multi_host", r.get("one_host", r))
        if h == 1 and "one_host" in r:
            meas = r["one_host"]
        rows.append((h, meas))
        print(f"hosts={h}: {meas}", flush=True)

    base = rows[0][1]["tokens_per_s"] / rows[0][1]["batch"]  # per-slot rate
    doc = os.path.join(REPO, "docs", "SCALING.md")
    with open(doc, "w") as fh:
        fh.write(
            "# Emulated multi-host scaling curve\n\n"
            "Regenerated per round by `python scripts/gen_scaling_doc.py` "
            "(CPU backend, real\n`jax.distributed` bring-up over TCP, "
            "DCN-aware hybrid mesh, the same SPMD decode\nprogram a pod "
            "would run; %d virtual devices/host, %d decode steps, toy "
            "llama).\n\n"
            "| hosts | devices | batch | tokens/s | per-step ms | "
            "per-host efficiency | non-compute fraction |\n"
            "|---|---|---|---|---|---|---|\n" % (dev, steps))
        for h, meas in rows:
            tps = meas["tokens_per_s"]
            B = meas["batch"]
            step_ms = B / tps * 1e3
            eff = (tps / B) / base
            fh.write(f"| {h} | {meas['devices']} | {B} | {tps} | "
                     f"{step_ms:.1f} | {eff:.3f} | {1-eff:.3f} |\n")
        fh.write(
            "\nper-host efficiency = per-slot decode rate at N hosts / "
            "rate at 1 host; the\nnon-compute fraction is the collective"
            "+sync share of each step that overlap\nmust hide on real "
            "ICI/DCN. The emulated ratio is gloo-latency-bound on a toy\n"
            "model — it tracks REGRESSIONS in the sharded program "
            "(mesh/sharding/collective\nstructure), not absolute "
            "hardware efficiency; the BASELINE >=85%% 1->2-host\nnumber "
            "needs a real pod (`scripts/scaling_bench.py --real` per "
            "host).\n")
    print(f"wrote {doc} in {time.time()-t0:.0f}s")


if __name__ == "__main__":
    main()
