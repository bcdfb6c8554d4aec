from . import batch, consensus, rowshard, runtime            # noqa: F401
from .batch import (                                          # noqa: F401
    make_data_mesh, shard_batch, solve_batch_shared)
from .consensus import ConsensusSpec, consensus_solve         # noqa: F401
from .rowshard import solve_rowsharded                        # noqa: F401
