"""Test harness config.

Runs the whole suite on the CPU backend (SURVEY §4: XLA host emulation
replaces the reference's absent distributed test story) so every sharding/
collective test runs without TPUs. Pallas kernels detect the CPU backend and
fall back to interpret mode (see ggmlsharp_tpu.kernels.config).

This sandbox bakes an `axon` TPU PJRT plugin into every interpreter via
sitecustomize (PYTHONPATH=/root/.axon_site). Its background claim/relay
machinery delays the first device-to-host transfer by 10-300s EVEN ON CPU.
The registration happens at interpreter startup — before conftest — so the
only reliable fix is to re-exec pytest once with a cleaned environment.
Set GGML_TPU_TEST_REAL=1 to skip the re-exec and run on real devices.
"""
import os
import sys

_REAL = bool(os.environ.get("GGML_TPU_TEST_REAL"))

if not _REAL and not os.environ.get("_GGML_TPU_REEXEC"):
    env = dict(os.environ)
    env["_GGML_TPU_REEXEC"] = "1"
    env["PYTHONPATH"] = ""  # drop the axon sitecustomize
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")  # silence AOT-loader warnings
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    os.execve(sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]], env)

if not _REAL:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
if not _REAL:
    # 8 virtual CPU devices for sharding/collective tests (SURVEY §4)
    jax.config.update("jax_num_cpu_devices", 8)
