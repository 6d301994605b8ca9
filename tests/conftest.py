"""Test bootstrap: force an 8-device virtual CPU mesh before JAX import.

Tests never need the real TPU; sharding is validated on virtual CPU devices
exactly as the driver's dryrun_multichip does.
"""
import os
import sys
from pathlib import Path

# force CPU even when the environment pins JAX_PLATFORMS=axon (real TPU)
os.environ["JAX_PLATFORMS"] = "cpu"
# The axon sitecustomize registers the TPU backend in any process where
# PALLAS_AXON_POOL_IPS is set — including SUBPROCESSES tests spawn (CLI
# script tests). A child grabbing the single shared device lease while this
# process holds it wedges the child until its timeout (observed: a
# summarize_dtu.py CLI test hanging 600 s). Too late for this process
# (sitecustomize ran at interpreter start), but dropping the var here means
# every inherited-env subprocess runs pure-CPU JAX with no lease contention.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# Persistent compilation cache: the host has one CPU core, so XLA compiles
# dominate test wall-clock; cache them across runs.
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# The axon sitecustomize force-registers the TPU backend in every process
# (ignoring JAX_PLATFORMS), so pin the default device to CPU explicitly —
# tests must never touch the tunneled TPU (single shared lease; concurrent
# users appear hung).
jax.config.update("jax_default_device", jax.devices("cpu")[0])
