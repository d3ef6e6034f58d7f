from opensetgaitrecognition_pcaa_tpu.utils.profiling import (  # noqa: F401
    StepTimer,
    trace,
)
from opensetgaitrecognition_pcaa_tpu.utils.debug import (  # noqa: F401
    enable_nan_checks,
)
from opensetgaitrecognition_pcaa_tpu.utils.plotting import (  # noqa: F401
    plot_pointcloud,
)
