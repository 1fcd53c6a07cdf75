from . import serialization
