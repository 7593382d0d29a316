"""Top-level Draco encoder.

Stream layout (encode/mod.rs:59-97): header -> optional metadata ->
connectivity -> attributes.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

from ..models.mesh import Mesh
from ..wire.byte_io import ByteWriter
from .attribute import encode_attributes
from .connectivity import EdgebreakerEncoder

GEOMETRY_POINT_CLOUD = 0
GEOMETRY_TRIANGULAR_MESH = 1

METHOD_SEQUENTIAL = 0
METHOD_EDGEBREAKER = 1

METADATA_FLAG_MASK = 32768


@dataclass
class Config:
    """Encoder configuration (encode/mod.rs:22-42). Defaults mirror
    ConfigType::default(): edgebreaker triangular mesh, Standard traversal,
    no metadata."""
    geometry_type: int = GEOMETRY_TRIANGULAR_MESH
    encoder_method: int = METHOD_EDGEBREAKER
    metadata: bool = False
    # EB_STANDARD (CrLight bits) or EB_VALENCE (per-context rANS streams,
    # shared/connectivity/edgebreaker/mod.rs:20-53)
    traversal: int = 0
    # per-AttributeType quantization bit overrides (draco_encoder's
    # -qp/-qt/-qn; octahedral normals accept 7..16 bits, default 8)
    quant_bits: dict = field(default_factory=dict)
    # attribute residual symbol coding: "direct" (reference-faithful),
    # "length", or "auto" (LengthCoded for wide alphabets)
    symbol_coding: str = "direct"
    # per-AttributeType prediction-scheme overrides (wire ids,
    # shared/prediction.py) — e.g. {AttributeType.POSITION:
    # PRED_MULTI_PARALLELOGRAM} opts into the averaged multi-parallelogram
    # the reference only stubs; streams stay self-describing
    prediction: dict = field(default_factory=dict)
    # per-AttributeType residual-transform overrides (wire ids,
    # encode/transforms.py) — e.g. {AttributeType.NORMAL: XFORM_ORTHOGONAL}
    # opts normals into the exact D4 orthogonal transform (wire id 4, the
    # one the reference declares but leaves unimplemented!(),
    # orthogonal.rs:44) or OctReflection (wire id 2, half-built in the
    # reference). Streams stay self-describing; strict mode rejects
    # overrides (the reference encoder only ever emits OctOrthogonal)
    transform: dict = field(default_factory=dict)
    # attribute traversal order: "depth-first" (wire TraversalType=0, the
    # only one the reference writes) or "prediction-degree" (wire 1 — the
    # reference declares the enum variant but ships no sequencer,
    # shared/connectivity/edgebreaker/mod.rs:59-88; ours is real). Both
    # are topology-only, so streams stay self-describing; strict rejects
    # prediction-degree
    attribute_traversal: str = "depth-first"
    # sequential-connectivity index payload: "direct" (id 1, the only
    # method the reference's encoder emits) or "compressed" (id 0, the
    # delta-coded method the reference models but never implements —
    # shared/connectivity/sequential.rs:23-38)
    sequential_method: str = "direct"
    # one corner table for ALL attributes: combined vertex identity,
    # attribute seams become real cuts, no per-attribute seam streams
    # (num_attribute_tables = 0). Mirrors the reference Config knob at
    # edgebreaker.rs:85 whose true-branch panics (edgebreaker.rs:129-130);
    # since the reference encoder can never emit this surface, strict
    # mode rejects it
    use_single_connectivity: bool = False
    # strict Draco conformance: reject every tpudraco-only dialect surface
    # (valence traversal, multi-parallelogram, auto/length symbol coding,
    # compressed sequential indices, point-cloud geometry) so the output
    # is guaranteed to be shaped exactly like the reference encoder's
    # emitted surface (Draco v2.2, edgebreaker Standard, DirectCoded)
    strict: bool = False
    extra: dict = field(default_factory=dict)

    def validate_strict(self, geometry_type: int | None = None) -> None:
        """Raise if any knob selects a tpudraco-only stream surface the
        reference encoder never emits (see ``strict``)."""
        from ..shared.clers import EB_STANDARD
        offending = []
        if self.traversal != EB_STANDARD:
            offending.append("non-standard edgebreaker traversal "
                             "(valence/predictive are tpudraco dialects; "
                             "the reference only emits Standard)")
        if self.symbol_coding != "direct":
            offending.append(
                f"symbol_coding={self.symbol_coding!r} (reference emits "
                "DirectCoded for attribute residuals)")
        if self.prediction:
            offending.append("prediction overrides (the reference only "
                             "emits single-parallelogram)")
        if self.transform:
            offending.append("transform overrides (the reference only "
                             "emits OctOrthogonal for normals; its "
                             "Orthogonal/OctReflection bodies are "
                             "unimplemented)")
        if self.attribute_traversal != "depth-first":
            offending.append("prediction-degree traversal (the reference "
                             "declares TraversalType=1 but only ever "
                             "writes DepthFirst)")
        if self.sequential_method != "direct":
            offending.append("compressed sequential indices (the reference "
                             "models but never emits method 0)")
        if self.use_single_connectivity:
            offending.append("single connectivity (the reference knob "
                             "panics when enabled, edgebreaker.rs:129-130, "
                             "so its encoder never emits "
                             "num_attribute_tables=0 for multi-attribute "
                             "meshes)")
        gt = self.geometry_type if geometry_type is None else geometry_type
        if gt == GEOMETRY_POINT_CLOUD:
            offending.append("point-cloud geometry (tpudraco dialect inside "
                             "geometry type 0; the reference's point-cloud "
                             "path is a dead stub)")
        if offending:
            raise ValueError("strict Draco mode rejects: "
                             + "; ".join(offending))

    @classmethod
    def from_level(cls, level: int) -> "Config":
        """draco_encoder's -cl compression-level knob (0 = fastest,
        10 = smallest), mapped onto this framework's knobs. The reference
        declares no such mapping (its Config fields are mostly unwired);
        this one is documented and pinned by tests:
          0-2: sequential connectivity (raw indices, no traversal)
          3-6: edgebreaker Standard, reference-faithful DirectCoded
          7-8: edgebreaker Standard + table-aware auto symbol coding
          9-10: valence traversal + auto symbol coding + (10) averaged
                multi-parallelogram positions, derivative UV prediction,
                and the exact D4 orthogonal normal transform (round 5:
                each measured smaller on the fixture corpus — sphere
                normals 1776B vs 1962B, Duck UVs 11270B vs 12203B) —
                tpudraco-dialect streams, smallest output, decodable by
                this framework
        """
        if not 0 <= level <= 10:
            raise ValueError(f"compression level {level} not in 0..10")
        from ..shared.clers import EB_VALENCE
        if level <= 2:
            return cls(encoder_method=METHOD_SEQUENTIAL)
        if level <= 6:
            return cls()
        if level <= 8:
            return cls(symbol_coding="auto")
        cfg = cls(traversal=EB_VALENCE, symbol_coding="auto")
        if level == 10:
            from ..models.attribute import AttributeType
            from ..shared.prediction import (PRED_DERIVATIVE,
                                             PRED_MULTI_PARALLELOGRAM)
            from .transforms import XFORM_ORTHOGONAL
            cfg.prediction = {
                AttributeType.POSITION: PRED_MULTI_PARALLELOGRAM,
                AttributeType.TEX_COORD: PRED_DERIVATIVE}
            cfg.transform = {AttributeType.NORMAL: XFORM_ORTHOGONAL}
        return cfg


def _traversal_wire_id(name: str) -> int:
    """Config.attribute_traversal -> wire TraversalType (mod.rs:59-88)."""
    from ..shared.clers import (TRAVERSAL_DEPTH_FIRST,
                                TRAVERSAL_PREDICTION_DEGREE)
    try:
        return {"depth-first": TRAVERSAL_DEPTH_FIRST,
                "prediction-degree": TRAVERSAL_PREDICTION_DEGREE}[name]
    except KeyError:
        raise ValueError(f"unknown attribute_traversal {name!r}; pick "
                         "'depth-first' or 'prediction-degree'") from None


def encode_header(writer: ByteWriter, cfg: Config) -> None:
    """"DRACO", version 2.2, geometry type, method, u16 flags
    (encode/header/mod.rs:24-55). Point clouds (geometry type 0, a dead
    stub in the reference) always use sequential; triangular meshes honor
    cfg.encoder_method (the reference's own sequential mesh path is
    unimplemented past connectivity — attribute_encoder.rs:254)."""
    writer.write_bytes(b"DRACO")
    writer.write_u8(2)
    writer.write_u8(2)
    writer.write_u8(cfg.geometry_type)
    writer.write_u8(METHOD_SEQUENTIAL
                    if cfg.geometry_type == GEOMETRY_POINT_CLOUD
                    else cfg.encoder_method)
    writer.write_u16(METADATA_FLAG_MASK if cfg.metadata else 0)


def encode_metadata(mesh: Mesh, writer: ByteWriter) -> None:
    """Full metadata section (models/metadata.py wire format; the
    reference's encoder is a stub at encode/metadata/mod.rs:9-20 that its
    own decoder cannot parse — we always emit the decodable form)."""
    from ..models.metadata import GeometryMetadata
    md = mesh.metadata if mesh.metadata is not None else GeometryMetadata()
    md.write_to(writer)


def encode(mesh: Mesh, writer: ByteWriter | None = None,
           cfg: Config | None = None, recorder=None) -> bytes:
    """Encode a mesh into the Draco v2.2 bitstream. Returns the bytes (and
    also appends into ``writer`` when given). ``recorder`` is an optional
    tpudraco.eval.EvalRecorder capturing per-stage metrics."""
    from ..eval import NULL
    from ..utils.debug import debug_write
    rec = recorder if recorder is not None else NULL
    cfg = cfg or Config()
    if cfg.quant_bits:
        from .portabilization import default_portabilization_for
        for t in cfg.quant_bits:  # validate overrides eagerly
            default_portabilization_for(t, cfg.quant_bits)
    if mesh.metadata is not None and not mesh.metadata.is_empty():
        cfg = replace(cfg, metadata=True)
    if mesh.num_faces == 0 and mesh.attributes:
        cfg = replace(cfg, geometry_type=GEOMETRY_POINT_CLOUD)
    if cfg.strict:
        cfg.validate_strict()
    writer = writer if writer is not None else ByteWriter()
    rec.scope_begin("compression info", writer)
    rec.scope_begin("header", writer)
    encode_header(writer, cfg)
    rec.scope_end(writer)
    debug_write(writer, "header done")
    if cfg.metadata:
        rec.scope_begin("metadata", writer)
        encode_metadata(mesh, writer)
        rec.scope_end(writer)
    if cfg.geometry_type == GEOMETRY_POINT_CLOUD:
        from .point_cloud import encode_point_cloud
        rec.scope_begin("point cloud", writer)
        encode_point_cloud(mesh, writer, quant_bits=cfg.quant_bits)
        rec.scope_end(writer)
        rec.scope_end(writer)
        return writer.getvalue()
    if cfg.encoder_method == METHOD_SEQUENTIAL:
        # sequential mesh: raw indices + point-major attribute payload.
        # The reference's own sequential path dead-ends at attributes
        # (attribute_encoder.rs:254 unimplemented!); this is the completed
        # form. We also write num_points, which the reference's sequential
        # decoder expects but its encoder forgot (decode/connectivity/
        # sequential.rs:24 vs encode/connectivity/sequential.rs:80).
        from ..wire.varint import leb128_write
        from .connectivity import encode_sequential
        from .point_cloud import encode_sequential_attributes
        rec.scope_begin("sequential connectivity", writer)
        num_points = (mesh.attributes[0].num_points if mesh.attributes
                      else int(mesh.faces.max()) + 1 if mesh.num_faces else 0)
        leb128_write(num_points, writer)
        encode_sequential(mesh.faces, num_points, writer,
                          method=cfg.sequential_method)
        rec.scope_end(writer)
        debug_write(writer, "connectivity done")
        rec.scope_begin("attributes", writer)
        encode_sequential_attributes(
            [(a.att_type, a.unique_id, a.values_per_point())
             for a in mesh.attributes], num_points, writer,
            quant_bits=cfg.quant_bits)
        rec.scope_end(writer)
        debug_write(writer, "attributes done")
        rec.scope_end(writer)
        return writer.getvalue()

    rec.scope_begin("connectivity info", writer)
    eb = EdgebreakerEncoder(
        mesh.faces, mesh.attributes, traversal=cfg.traversal,
        single_connectivity=cfg.use_single_connectivity)
    conn_out = eb.encode(writer)
    debug_write(writer, "connectivity done")
    rec.write_pair("num_faces", int(mesh.num_faces))
    rec.write_pair("num_vertices", int(eb.ct.num_vertices))
    rec.write_pair("num_symbols", len(eb.symbols))
    rec.write_pair("num_split_symbols", eb.num_split_symbols)
    rec.write_pair("topology_splits", len(eb.topology_splits))
    rec.scope_end(writer)
    rec.scope_begin("attributes", writer)
    encode_attributes(mesh.attributes, writer, conn_out, recorder=rec,
                      quant_bits=cfg.quant_bits,
                      symbol_coding=cfg.symbol_coding,
                      prediction=cfg.prediction,
                      transform=cfg.transform,
                      attribute_traversal=_traversal_wire_id(
                          cfg.attribute_traversal))
    rec.scope_end(writer)
    debug_write(writer, "attributes done")
    rec.scope_end(writer)
    return writer.getvalue()


__all__ = ["Config", "encode", "encode_header", "encode_metadata",
           "GEOMETRY_TRIANGULAR_MESH", "GEOMETRY_POINT_CLOUD",
           "METHOD_EDGEBREAKER", "METHOD_SEQUENTIAL"]
