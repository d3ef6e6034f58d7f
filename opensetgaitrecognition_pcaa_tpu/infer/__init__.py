from opensetgaitrecognition_pcaa_tpu.infer.pcaa import (  # noqa: F401
    naive_sequential_procedure,
    pcaa_inference,
    pcaa_inference_setup,
)
from opensetgaitrecognition_pcaa_tpu.infer.orced import (  # noqa: F401
    orced_ensemble_ood_detection,
    orced_inference,
)
