from .logging import Logger
from .timing import PhaseTimer, timed
