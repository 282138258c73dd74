"""Typed factor-graph system (reference: include/slam/FlatSystem.h, BaseTypes*.h)."""

from slampp_tpu.graph.types import VertexType, EdgeType, TYPE_REGISTRY, register_vertex_type, register_edge_type
from slampp_tpu.graph.system import GraphSystem
