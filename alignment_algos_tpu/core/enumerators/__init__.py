from .optimal import Optimal, OptimalRev, OptimalSubali
from .cw import ConstrainedNearOptimal
from .ucw import UnconstrainedNearOptimal

__all__ = [
    "Optimal", "OptimalRev", "OptimalSubali",
    "ConstrainedNearOptimal", "UnconstrainedNearOptimal",
]
