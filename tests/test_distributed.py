"""jax.distributed multi-process integration: two CPU processes form one
4-device mesh and run a cross-process psum over gloo. This is the real
multi-host path behind parallel.mesh.init_distributed (round-1 gap: the
function existed but was exercised nowhere)."""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2"
    ).strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, %(repo)r)
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    os.environ["DEEPWMH_COORDINATOR"] = %(coord)r
    os.environ["DEEPWMH_NUM_PROCESSES"] = "2"
    os.environ["DEEPWMH_PROCESS_ID"] = sys.argv[1]
    from deepwmh_tpu.parallel.mesh import device_info, init_distributed_from_env

    assert init_distributed_from_env()
    info = device_info()
    assert info["process_count"] == 2, info
    assert info["device_count"] == 4, info

    mesh = Mesh(np.array(jax.devices()), ("dp",))

    @jax.jit
    def f(x):
        return jax.shard_map(
            lambda v: jax.lax.psum(v, "dp"), mesh=mesh,
            in_specs=P("dp"), out_specs=P(),
        )(x)

    local = jax.device_put(
        np.arange(4, dtype=np.float32).reshape(4, 1),
        NamedSharding(mesh, P("dp")),
    )
    out = f(local)
    got = float(np.asarray(out.addressable_shards[0].data).ravel()[0])
    assert got == 6.0, got
    print("proc %%s ok" %% sys.argv[1], flush=True)
    """
)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    coord = "127.0.0.1:%d" % _free_port()
    script = str(tmp_path / "worker.py")
    with open(script, "w") as f:
        f.write(WORKER % {"repo": repo, "coord": coord})

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, script, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        outs.append(out.decode())
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, "proc %d failed:\n%s" % (pid, out)
        assert ("proc %d ok" % pid) in out
