from advshadow_tpu.utils import choices
from advshadow_tpu.utils.images import (
    append_args_log,
    save_images,
    save_one_image_in_images,
    setup_logging,
)
from advshadow_tpu.utils.logger import CustomLogger, get_logger
from advshadow_tpu.utils.profiling import (
    StepTimer,
    enable_nan_debugging,
    log_compile_time,
    trace,
)
from advshadow_tpu.utils.runtime import runtime_init
from advshadow_tpu.utils.seed import seed_initializer

__all__ = [
    "choices",
    "append_args_log",
    "save_images",
    "save_one_image_in_images",
    "setup_logging",
    "CustomLogger",
    "StepTimer",
    "enable_nan_debugging",
    "log_compile_time",
    "trace",
    "get_logger",
    "runtime_init",
    "seed_initializer",
]
