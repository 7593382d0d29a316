from .batch import (
    BatchEncoder,
    PreparedTopology,
    device_encode_group,
    encode_with_topology,
    topology_signature,
)

__all__ = ["BatchEncoder", "PreparedTopology", "device_encode_group",
           "encode_with_topology", "topology_signature"]
