from .ngp_occ import NGPOccTrainer, TrainState

__all__ = ["NGPOccTrainer", "TrainState"]
