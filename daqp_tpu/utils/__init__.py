from .timers import Timer
