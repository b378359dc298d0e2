from .anchor_head_multi import AnchorHeadMulti
from .anchor_head_single import AnchorHeadSingle

__all__ = {
    'AnchorHeadSingle': AnchorHeadSingle,
    'AnchorHeadMulti': AnchorHeadMulti,
}
