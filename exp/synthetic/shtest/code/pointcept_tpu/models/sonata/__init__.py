from .sonata import Sonata, OnlineCluster, sinkhorn_knopp
