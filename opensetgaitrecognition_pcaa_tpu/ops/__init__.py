from opensetgaitrecognition_pcaa_tpu.ops.chamfer import seq_chamfer  # noqa: F401
from opensetgaitrecognition_pcaa_tpu.ops.losses import (  # noqa: F401
    cg_kl_divergence,
    cross_entropy,
    triplet_loss_with_ms_miner,
)
from opensetgaitrecognition_pcaa_tpu.ops.gp import gradient_penalty  # noqa: F401
from opensetgaitrecognition_pcaa_tpu.ops.openset import (  # noqa: F401
    best_youden_threshold,
    hyperrectangle_prob,
    log_joint_likelihood,
    normal_pdf,
    openness,
    underflow_tied,
)
from opensetgaitrecognition_pcaa_tpu.ops.centroids import (  # noqa: F401
    sample_distant_points,
)
