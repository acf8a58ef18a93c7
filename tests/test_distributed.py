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


@pytest.mark.slow
def test_register_pairs_mesh():
    """Batched pair registration sharded over an 8-device mesh: shapes,
    the batch-padding path (B not a device multiple), and registration
    quality. Bitwise comparison against an unsharded run is NOT the
    contract — partitioned compilation legitimately changes reduction
    tilings, and over Adam iterations the trajectories drift — so each
    pair is checked for recovering a known translation and improving
    alignment."""
    import jax
    import numpy as np
    from scipy.ndimage import gaussian_filter, shift as nd_shift
    from jax.sharding import Mesh

    from deepwmh_tpu.registration.affine import AffineConfig
    from deepwmh_tpu.registration.group import register_pairs_mesh
    from deepwmh_tpu.registration.svf import SVFConfig

    rng = np.random.RandomState(0)
    shape = (24, 26, 22)
    g = np.meshgrid(*[np.linspace(-1, 1, s) for s in shape], indexing="ij")
    rr = np.sqrt(sum(a**2 for a in g))

    B = 5  # deliberately NOT a multiple of the 8-device mesh (pad path)
    fixed, moving, true_shift = [], [], []
    for i in range(B):
        tex = gaussian_filter(rng.rand(*shape), 2).astype(np.float32)
        img = ((rr < 0.8) * (200 + 600 * tex)).astype(np.float32)
        dz = 1.5 + 0.3 * i
        fixed.append(img)
        moving.append(nd_shift(img, (dz, 0.8, -0.5), order=1))
        true_shift.append((dz, 0.8, -0.5))
    fixed = np.stack(fixed)
    moving = np.stack(moving)
    sp = np.array([1.0, 1.0, 1.0], np.float32)

    acfg = AffineConfig(shrinks=(2,), iters=(60,))
    scfg = SVFConfig(shrinks=(2,), iters=(10,))

    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    mats, alosses, disps, slosses, warped = register_pairs_mesh(
        fixed, moving, sp, sp, mesh, affine_cfg=acfg, svf_cfg=scfg
    )
    assert mats.shape[0] == B and warped.shape[0] == B and disps.shape[0] == B

    for i in range(B):
        w = np.asarray(warped[i], np.float32)
        before = np.mean((fixed[i] - moving[i]) ** 2)
        after = np.mean((fixed[i] - w) ** 2)
        assert after < 0.5 * before, (i, after, before)
        # the affine translation should carry most of the known shift
        t = np.asarray(mats[i])[:, 3]
        err = np.abs(t - np.asarray(true_shift[i]))
        assert err.max() < 1.0, (i, t, true_shift[i])
