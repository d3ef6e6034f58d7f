from opensetgaitrecognition_pcaa_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    create_mesh,
    state_shardings,
)
