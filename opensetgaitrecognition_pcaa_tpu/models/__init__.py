from opensetgaitrecognition_pcaa_tpu.models.norm import TorchBatchNorm  # noqa: F401
from opensetgaitrecognition_pcaa_tpu.models.layers import (  # noqa: F401
    PointNetBlock,
    TemporalConvBlock,
)
from opensetgaitrecognition_pcaa_tpu.models.pcaa import (  # noqa: F401
    CGDecoder,
    CGDiscriminator,
    CGEncoder,
    ProjectionHead,
)
from opensetgaitrecognition_pcaa_tpu.models.mean_learner import (  # noqa: F401
    GaussianMeanLearner,
)
from opensetgaitrecognition_pcaa_tpu.models.orced import (  # noqa: F401
    ORCEDDecoder,
    ORCEDEncoder,
)
