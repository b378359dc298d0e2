from .height_compression import HeightCompression
from .pointpillar_scatter import PointPillarScatter, PointPillarScatterAggMemory1Scale

__all__ = {
    'HeightCompression': HeightCompression,
    'PointPillarScatter': PointPillarScatter,
    'PointPillarScatter_Agg_Memory_1_scale': PointPillarScatterAggMemory1Scale,
}
