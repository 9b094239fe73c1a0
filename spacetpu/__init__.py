"""spacetpu — TPU-native gravitational N-body engine (JAX/XLA/Pallas).

Brand-new implementation with the capabilities of the Rust reference
`einarmo/n-body-rust`, redesigned TPU-first. See SURVEY.md for the layer
map and ARCHITECTURE.md for how each reference component maps here.
"""

from spacetpu import constants
from spacetpu.engine import Exchange, SimEngine, make_engine_for
from spacetpu.state import Body, Scene, State, make_state
from spacetpu.sim import Simulation, SimConfig, make_simulation, reference_compatible
from spacetpu.utils.metrics import ElapsedTime, compute_elapsed_time

__version__ = "0.1.0"

__all__ = [
    "Body",
    "ElapsedTime",
    "Exchange",
    "Scene",
    "SimConfig",
    "SimEngine",
    "Simulation",
    "State",
    "compute_elapsed_time",
    "constants",
    "make_engine_for",
    "make_simulation",
    "make_state",
    "reference_compatible",
]
