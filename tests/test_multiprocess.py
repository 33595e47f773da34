"""Real multi-process jax.distributed test on localhost CPU devices —
the TPU-native mirror of the reference's localhost-gRPC shard test
(tests/distributed_integration_test.rs): two actual processes rendezvous
at a coordinator, form one global mesh, and run a sharded computation."""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=4").strip()
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

from llama_gguf_tpu.parallel.multihost import ClusterConfig, initialize_cluster

port = sys.argv[1]
pid = int(sys.argv[2])
info = initialize_cluster(ClusterConfig(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid))
assert info["process_count"] == 2, info
assert info["global_devices"] == 8, info

# sharded all-reduce over the global mesh: every process contributes its
# local shard; the psum must see all 8 devices' values
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

devs = np.array(jax.devices()).reshape(8)
mesh = Mesh(devs, ("d",))
x = jnp.arange(8, dtype=jnp.float32)  # globally replicated construction
xs = jax.device_put(x, NamedSharding(mesh, P("d")))

@jax.jit
def total(v):
    return jnp.sum(v)

out = float(np.asarray(total(xs)))
assert out == 28.0, out
print(f"proc {pid} OK global_devices={info['global_devices']} sum={out}")
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed(tmp_path):
    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(port), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=repo)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-2000:]}"
        assert f"proc {pid} OK" in out
        assert "global_devices=8" in out


def test_shard_cli_two_process(tmp_path):
    """End-to-end `shard` CLI: two processes join one cluster, load the
    same tiny GGUF sharded over the 8-device global mesh (tp=8), and the
    leader generates greedily through the SPMD serve loop."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from fixtures import make_tiny_model

    model = str(tmp_path / "tiny.gguf")
    make_tiny_model(model, arch="qwen2", vocab=260, hidden=64, layers=2,
                    heads=8, kv_heads=8, ffn=128, ctx=128, tokenizer=True)

    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        " --xla_force_host_platform_device_count=4").strip()
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "llama_gguf_tpu", "shard", model,
             "--coordinator", f"127.0.0.1:{port}",
             "--num-processes", "2", "--process-id", str(pid),
             "--tp", "8", "--prompt", "hello world", "-n", "6",
             "--platform", "cpu"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=repo)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"shard {pid} failed:\n{out[-3000:]}"
        assert "served 1 request(s)" in out


SLOW_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=4").strip()
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from llama_gguf_tpu.parallel.multihost import ClusterConfig, initialize_cluster
from llama_gguf_tpu.parallel.service import serve_spmd
from llama_gguf_tpu.engine.engine import Engine, EngineConfig

port, pid, model = sys.argv[1], int(sys.argv[2]), sys.argv[3]
initialize_cluster(ClusterConfig(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid))
eng = Engine.load(model, EngineConfig(weight_mode="dequant",
                                      mesh_model=8, max_context_len=128))
reqs = [([1, 2, 3], 3)] * 3 if pid == 0 else []
metrics = {}
outs = serve_spmd(eng.runner, eng.tokenizer, reqs, step_metrics=metrics)
if pid == 0:
    r = {k: round(m.ewma_s, 3) for k, m in metrics.items()}
    print("leader metrics:", r)
print(f"proc {pid} done rounds={len(outs)}")
"""


def test_degraded_host_imbalance_detected(tmp_path):
    """Degraded-host scenario end-to-end: process 1 is artificially slowed
    each round; the leader's imbalance monitor must detect and log it
    (parity: load_balancer.rs LoadBalancer::evaluate, adapted to SPMD
    where detection is diagnostic). The first (compile-dominated) round is
    excluded from the monitor, so detection comes from rounds 2-3."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from fixtures import make_tiny_model

    model = str(tmp_path / "tiny.gguf")
    make_tiny_model(model, arch="qwen2", vocab=260, hidden=64, layers=2,
                    heads=8, kv_heads=8, ffn=128, ctx=128, tokenizer=True)

    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base_env = dict(os.environ)
    base_env.pop("JAX_PLATFORMS", None)
    base_env["PYTHONPATH"] = repo + os.pathsep + base_env.get("PYTHONPATH", "")
    script = tmp_path / "slow_worker.py"
    script.write_text(SLOW_WORKER)
    procs = []
    for pid in (0, 1):
        env = dict(base_env)
        if pid == 1:  # the degraded host
            env["LLAMA_GGUF_STEP_SLOWDOWN_S"] = "1.0"
        procs.append(subprocess.Popen(
            [sys.executable, str(script), str(port), str(pid), model],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=repo))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
    assert "host imbalance detected" in outs[0], outs[0][-3000:]
    assert "leader metrics:" in outs[0]
