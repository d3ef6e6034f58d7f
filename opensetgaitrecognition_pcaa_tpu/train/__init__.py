from opensetgaitrecognition_pcaa_tpu.train.run_folder import (  # noqa: F401
    load_array,
    load_params,
    save_array,
    save_params,
)
from opensetgaitrecognition_pcaa_tpu.train.pcaa import (  # noqa: F401
    VariantSpec,
    train_pcaa,
)
from opensetgaitrecognition_pcaa_tpu.train.orced import train_orced  # noqa: F401
