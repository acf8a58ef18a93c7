from deepwmh_tpu.ops.stats import (  # noqa: F401
    masked_mean,
    masked_std,
    z_score,
    group_mean,
    group_std,
)
from deepwmh_tpu.ops.nll import nll  # noqa: F401
from deepwmh_tpu.ops.grid import mean_std_grid  # noqa: F401
from deepwmh_tpu.ops.histogram import (  # noqa: F401
    masked_histogram,
    otsu_threshold,
    hist_curve,
    histogram_analysis,
)
from deepwmh_tpu.ops.filters import (  # noqa: F401
    mean_filter,
    median_filter,
    min_filter,
    max_filter,
    median_3mm,
)
from deepwmh_tpu.ops.components import (  # noqa: F401
    label_components,
    component_sizes,
    remove_sparks,
    remove_3mm_sparks,
    component_filtering,
    largest_component,
    average_contiguous_labels,
    map_label,
)
from deepwmh_tpu.ops.morphology import (  # noqa: F401
    binary_erosion_2d,
    binary_dilation_2d,
    binary_erosion_3d,
    binary_dilation_3d,
)
