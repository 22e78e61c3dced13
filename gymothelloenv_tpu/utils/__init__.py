from gymothelloenv_tpu.utils.checkpoint import (  # noqa: F401
    load_checkpoint,
    save_checkpoint,
)
from gymothelloenv_tpu.utils.logging import MetricsLogger  # noqa: F401
