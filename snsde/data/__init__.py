from .common import (
    append_time_intensity,
    cache_path,
    inject_missingness,
    load_cached,
    normalize_with_train_stats,
    preprocess_classification,
    save_cached,
    stratified_split,
)
from .ou import generate_ou_paths, ou_dataset
from .synthetic import (
    synthetic_mujoco,
    synthetic_sepsis,
    synthetic_speech,
    synthetic_uea,
)
from . import mujoco, person_activity, physionet2012, sepsis, speech_commands, uea
from .native import get_lib as native_lib
