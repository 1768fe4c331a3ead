"""pdmpc_tpu — TPU-native prioritized distributed MPC for networked vehicles.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
embedded-software-laboratory/p-dmpc (MATLAB reference): motion-primitive
receding-horizon planning, coupling-graph prioritization, and distributed
per-level execution — expressed as batched fixed-shape TPU programs.
"""

from pdmpc_tpu.config import (
    ComputationMode,
    Config,
    ConstraintFromSuccessor,
    CouplingStrategies,
    CutStrategies,
    Environment,
    ManualControlConfig,
    MpaType,
    OptimizerType,
    PriorityStrategies,
    ScenarioType,
    WeightStrategies,
)

__all__ = [
    "Config",
    "ComputationMode",
    "ConstraintFromSuccessor",
    "CouplingStrategies",
    "CutStrategies",
    "Environment",
    "ManualControlConfig",
    "MpaType",
    "OptimizerType",
    "PriorityStrategies",
    "ScenarioType",
    "WeightStrategies",
]

__version__ = "0.1.0"
