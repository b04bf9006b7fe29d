from .structures import GTSample, TrainBatch
