from .sgiformer import SGIFormer, SGIFormerDecoder
