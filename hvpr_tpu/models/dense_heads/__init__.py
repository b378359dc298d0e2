from .anchor_head_single import AnchorHeadSingle

__all__ = {
    'AnchorHeadSingle': AnchorHeadSingle,
}
