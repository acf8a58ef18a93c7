"""Package metadata (reference: deepwmh/pkginfo.py:1-3)."""

__version__ = "0.1.0"
__package_name__ = "deepwmh_tpu"
