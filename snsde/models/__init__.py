from .ancde import ANCDE, EXIT, LEAP, NeuralRDE, hard_sigmoid_ste
from .attn import MIAMLayer, SAnDLayer, dense_interpolation
from .flows import (
    CouplingFlowLayer,
    GRUFlowBlock,
    NeuralControlledFlow,
    NeuralFlow,
    NeuralFlowCDE,
    NeuralMixture,
    ResNetFlowLayer,
    TimeTanh,
)
from .latent_sde import LatentSDE
from .mtan import (
    DecRNN3,
    LatentClassifier,
    MTANClassifier,
    MTANDecoder,
    MTANEncoder,
    MultiTimeAttention,
    TimeEmbedding,
)
from .time_rnn import GRUDFull, ODELSTM, PLSTM, TGLSTM, TLSTM
from .neuralcde import (
    FinalTanh,
    GRUODEField,
    NeuralCDE,
    NeuralCDEStream,
    SingleHiddenLayer,
)
from .ensemble import SeedEnsemble
from .neuralsde import (
    NDEModel,
    NeuralSDE,
    NeuralSDEForecasting,
    NeuralSDEStream,
    ReadoutHead,
    resolve_dt,
)
from .rnn import GRUD, GRUdt, ODERNN, SeqCNN, SeqRNN, SeqTransformer
