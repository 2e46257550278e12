from . import clusters, eigh3, factors, lie
