from opensetgaitrecognition_pcaa_tpu.ops.pallas.chamfer_kernel import (  # noqa: F401
    seq_chamfer_pallas,
)
from opensetgaitrecognition_pcaa_tpu.ops.pallas.pointnet_infer import (  # noqa: F401
    fold_batchnorm,
    pointnet_pool_infer,
)
