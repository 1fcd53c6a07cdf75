from .litept import LitePT
