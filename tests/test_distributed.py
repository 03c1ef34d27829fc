"""Real 2-process jax.distributed smoke (round-5 verdict item #9).

Everything else in the suite exercises sharding on a single-process virtual
mesh; this launches TWO actual processes that rendezvous through
``initialize_distributed`` (coordinator on localhost) and run one ``psum``
across their devices — making the multi-host entry point more than a
wrapper. CPU-only; opt out with ``-m 'not distributed'`` if the sandbox
forbids localhost sockets.
"""
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.distributed

_WORKER = r"""
import importlib.util
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

# load mesh.py standalone: importing the package would run its table
# constructions (jnp.asarray at module scope), initialising the XLA backend
# before jax.distributed.initialize is allowed to run
_spec = importlib.util.spec_from_file_location(
    "p3d_mesh", os.path.join("primitive3d_tpu", "parallel", "mesh.py"))
_mesh_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mesh_mod)
initialize_distributed = _mesh_mod.initialize_distributed
make_mesh = _mesh_mod.make_mesh

port, pid = sys.argv[1], int(sys.argv[2])
initialize_distributed(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)
assert jax.process_count() == 2, jax.process_count()

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = make_mesh(axis_name="data")  # both processes' devices
n = len(jax.devices())
assert n == 2, n

# one global array sharded across the two processes; a psum-backed global
# sum must see both shards
x = jax.make_array_from_callback(
    (2,),
    NamedSharding(mesh, P("data")),
    lambda idx: jnp.asarray([float(pid + 1)], jnp.float32),
)


@jax.jit
def total(a):
    return jnp.sum(a)  # lowers to a cross-process all-reduce


out = float(total(x))
assert out == 3.0, out  # 1.0 (proc 0) + 2.0 (proc 1)
print(f"proc {pid} ok: global sum {out}", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_psum():
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # one device per process
    # the axon sitecustomize eagerly initialises the TPU backend at
    # interpreter start when this is set — jax.distributed.initialize
    # must run first, so strip it for the workers
    env.pop("PALLAS_AXON_POOL_IPS", None)
    root = os.path.join(os.path.dirname(__file__), "..")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(port), str(pid)],
            env=env, cwd=root,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=180)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed smoke timed out:\n" + "\n".join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid} ok" in out
