from .io import (
    read_json,
    write_json,
    load_pickle,
    save_pickle,
    create_folder,
    save_pandas_df,
    read_image,
    append_log_to_file,
)
from .metrics import MetricTracker
from .logging import setup_logging
from .misc import (
    convert_sec_to_max_time_quantity,
    plot_train_val_loss,
    convert_ds_folder_2_def_structure,
    convert_id_ds_2_def_structure,
)
from .platform import select_platform

__all__ = [
    "read_json",
    "write_json",
    "load_pickle",
    "save_pickle",
    "create_folder",
    "save_pandas_df",
    "read_image",
    "append_log_to_file",
    "MetricTracker",
    "setup_logging",
    "convert_sec_to_max_time_quantity",
    "plot_train_val_loss",
    "convert_ds_folder_2_def_structure",
    "convert_id_ds_2_def_structure",
    "select_platform",
]
