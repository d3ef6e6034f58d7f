from opensetgaitrecognition_pcaa_tpu.infer.pcaa import (  # noqa: F401
    calibrate_open_set,
    naive_sequential_procedure,
    pcaa_inference,
    pcaa_inference_setup,
)
from opensetgaitrecognition_pcaa_tpu.infer.orced import (  # noqa: F401
    orced_class_stats,
    orced_apply_ood,
    orced_ensemble_ood_detection,
    orced_inference,
)
from opensetgaitrecognition_pcaa_tpu.infer.serving import (  # noqa: F401
    export_orced_decision,
    export_pcaa_decision,
    load_serving_artifact,
)
