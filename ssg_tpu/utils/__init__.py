from ssg_tpu.utils.logging import Logger
from ssg_tpu.utils.meters import AverageMeter
from ssg_tpu.utils.serialization import (
    copy_state_dict,
    load_checkpoint,
    mkdir_if_missing,
    read_json,
    save_checkpoint,
    write_json,
)
