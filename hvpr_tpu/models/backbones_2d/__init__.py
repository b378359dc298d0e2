from .base_bev_backbone import BaseBEVBackbone, BaseBEVBackboneScale

__all__ = {
    'BaseBEVBackbone': BaseBEVBackbone,
    'BaseBEVBackbone_Scale': BaseBEVBackboneScale,
}
