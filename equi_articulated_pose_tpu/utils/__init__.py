from .logging import Logger
from .summary import Summary
from .timer import Timer
