from .core import (
    Buffer,
    Module,
    buffer,
    combine,
    field,
    filter_value_and_grad,
    is_trainable,
    module,
    partition,
    static_field,
    tree_count_params,
)
from .layers import (
    MLP,
    BatchNorm,
    Dropout,
    GRUCell,
    RNNCell,
    Linear,
    LSTMCell,
    init_linear,
    lipswish,
)
