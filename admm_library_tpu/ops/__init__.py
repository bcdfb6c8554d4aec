from . import banded, kkt, prox
