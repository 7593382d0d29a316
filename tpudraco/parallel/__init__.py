from .batch import (
    BatchEncoder,
    PreparedTopology,
    device_encode_group,
    encode_with_topology,
    topology_signature,
)
from .decode_batch import BatchDecoder
from .multihost import encode_corpus_multihost, init_distributed, shard_corpus
from .transcode import transcode_corpus

__all__ = ["BatchEncoder", "BatchDecoder", "PreparedTopology",
           "transcode_corpus",
           "device_encode_group", "encode_with_topology",
           "topology_signature", "encode_corpus_multihost",
           "init_distributed", "shard_corpus"]
