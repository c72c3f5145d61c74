from .activity import ActivityConfig, ActivityResult, run_activity
from .classification import (
    HarnessConfig,
    InitialValueModel,
    make_sde_model,
    parse_model_name,
    run_sepsis,
    run_speech,
)
from .forecasting import (
    ForecastConfig,
    make_forecast_model,
    resolve_sde_method,
    run_mujoco,
)
from .interpolation import (
    InterpolationConfig,
    run_interpolation,
    synthetic_physionet,
)
from .param_search import SearchSpace, asha_search
from .robustness import (
    ISTSClassifier,
    SweepConfig,
    make_fixed_splits,
    preprocess_ists,
    run_robustness_sweep,
    train_ists_model,
)
