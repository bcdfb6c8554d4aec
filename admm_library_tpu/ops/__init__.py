from . import banded, fused, kkt, prox                        # noqa: F401
