from .pillar_vfe import MeanVFE, PillarVFE, PillarVFE_Scale

__all__ = {
    'MeanVFE': MeanVFE,
    'PillarVFE': PillarVFE,
    'PillarVFE_Scale': PillarVFE_Scale,
}
