"""Scale layer: chunk batching, device-mesh sharding, batched containers.

The reference is single-threaded (SURVEY §2.9: no distributed runtime
exists); throughput in this framework comes from (1) fused XLA programs,
(2) ``vmap`` over chunk batches per chip, and (3) sharding chunk batches
across an ICI mesh — chunks share no state, so the only collectives are
input scatter and output gather.
"""

from .batch import (  # noqa: F401
    BatchFrameDecoder,
    BatchFrameEncoder,
    EncodedChunkStream,
    chunk_frames,
)
from .mesh import chunk_mesh, shard_batch  # noqa: F401
