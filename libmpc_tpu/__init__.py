"""libmpc-tpu: a TPU-native Model Predictive Control framework.

A from-scratch JAX/XLA re-design with the capabilities of libmpc++
(nicolapiccinelli/libmpc): linear MPC over a sparse simultaneous QP solved by
a batched OSQP-equivalent ADMM kernel, and nonlinear MPC over a simultaneous
NLP solved by an SQP loop with exact autodiff derivatives.  One controller
object can solve thousands of scenario instances per step on a TPU mesh.
"""

from .dims import LDims, NLDims
from .lmpc.controller import LMPC
from .types import (
    ConstraintsType,
    HorizonSlice,
    LParameters,
    NLParameters,
    OptSequence,
    Parameters,
    Result,
    ResultStatus,
    inf,
)
from .utils.discretization import (
    discretization,
    discretization_with_disturbance,
    discretization_with_output,
)
from .utils.integrators import rk4, rk4_step
from .utils.logger import Logger, LogLevel, LogType
from .utils.profiler import Profiler, SolutionStats

__version__ = "0.1.0"

__all__ = [
    "LMPC",
    "NLMPC",
    "LDims",
    "NLDims",
    "HorizonSlice",
    "ResultStatus",
    "ConstraintsType",
    "Parameters",
    "LParameters",
    "NLParameters",
    "Result",
    "OptSequence",
    "Logger",
    "LogLevel",
    "LogType",
    "Profiler",
    "SolutionStats",
    "discretization",
    "discretization_with_disturbance",
    "discretization_with_output",
    "rk4",
    "rk4_step",
    "inf",
]


def __getattr__(name):
    # NLMPC imported lazily to keep circularity manageable during buildout.
    if name == "NLMPC":
        from .nlmpc.controller import NLMPC

        return NLMPC
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
