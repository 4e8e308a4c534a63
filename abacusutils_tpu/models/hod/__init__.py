from .abacus_hod import AbacusHOD
from . import prepare_sim
