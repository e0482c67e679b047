from .checkpoint import load_checkpoint, load_filtered, safe_load_common, save_checkpoint
from .loop import Trainer
from .schedule import make_optimizer, make_schedule
from .state import TrainState
