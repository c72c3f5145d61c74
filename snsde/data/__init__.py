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
