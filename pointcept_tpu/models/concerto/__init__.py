from .concerto import Concerto
