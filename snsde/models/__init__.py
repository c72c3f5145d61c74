from .latent_sde import LatentSDE
from .neuralcde import (
    FinalTanh,
    GRUODEField,
    NeuralCDE,
    NeuralCDEStream,
    SingleHiddenLayer,
)
from .neuralsde import (
    NDEModel,
    NeuralSDE,
    NeuralSDEForecasting,
    NeuralSDEStream,
    ReadoutHead,
    resolve_dt,
)
from .rnn import GRUD, GRUdt, ODERNN, SeqCNN, SeqRNN, SeqTransformer
