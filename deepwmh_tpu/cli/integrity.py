"""System integrity check.

Counterpart of the reference's check_system_integrity
(deepwmh/main/integrity_check.py:8-155), which probes ANTs / nnU-Net /
FreeSurfer / FSL / ROBEX / CUDA. This framework internalizes all of those,
so the check reduces to: JAX importable, an accelerator (or CPU fallback)
visible, and the compute ops compiling on the selected backend.
"""

from __future__ import annotations


def check_system_integrity(verbose: bool = True, require_accelerator: bool = False) -> bool:
    ok = True

    def say(msg):
        if verbose:
            print(msg)

    try:
        import jax

        devs = jax.devices()
        say("[OK] jax %s, %d device(s): %s" % (jax.__version__, len(devs), devs[0].platform))
        if require_accelerator and devs[0].platform == "cpu":
            say("[!!] no TPU/accelerator found (running on CPU will be slow)")
            ok = False
    except Exception as e:  # pragma: no cover
        say("[!!] jax unavailable: %s" % e)
        return False

    try:
        import jax.numpy as jnp

        from deepwmh_tpu.ops.stats import z_score

        _ = z_score(jnp.ones((4, 4, 4))).block_until_ready()
        say("[OK] compute ops compile on this backend")
    except Exception as e:  # pragma: no cover
        say("[!!] ops failed to compile: %s" % e)
        ok = False

    for mod in ("flax", "optax", "numpy", "scipy"):
        try:
            __import__(mod)
            say("[OK] %s importable" % mod)
        except Exception:  # pragma: no cover
            say("[!!] missing dependency: %s" % mod)
            ok = False
    return ok
