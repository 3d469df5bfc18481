from .basis import KBasis, make_basis, error_layout
from .bpz import BPZ
