from . import math3d, rng
