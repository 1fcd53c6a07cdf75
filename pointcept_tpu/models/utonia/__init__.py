from .utonia import Utonia
