from deepwmh_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    init_distributed,
    device_info,
)
