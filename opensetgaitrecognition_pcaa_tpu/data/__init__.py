from opensetgaitrecognition_pcaa_tpu.data.preprocess import (  # noqa: F401
    crop_with_step,
    process_track,
)
from opensetgaitrecognition_pcaa_tpu.data.splits import generate_splits  # noqa: F401
from opensetgaitrecognition_pcaa_tpu.data.dataset import RadarCropDataset  # noqa: F401
from opensetgaitrecognition_pcaa_tpu.data.synthetic import (  # noqa: F401
    generate_synthetic_raw_dataset,
)
