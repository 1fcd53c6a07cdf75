from .structure import PointBatch, offset2batch, batch2offset
