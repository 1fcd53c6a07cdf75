from .spvcnn import SPVCNN
