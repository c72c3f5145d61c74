from .neuralsde import (
    NDEModel,
    NeuralSDE,
    NeuralSDEForecasting,
    NeuralSDEStream,
    ReadoutHead,
    resolve_dt,
)
