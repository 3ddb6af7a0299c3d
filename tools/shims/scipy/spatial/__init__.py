from . import distance  # noqa
