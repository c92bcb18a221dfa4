"""TPU-native substring-search framework.

A from-scratch re-design of Intsights/PySubstringSearch for TPU hardware:
same public API and on-disk index format, but suffix arrays are built by a
vectorized prefix-doubling sort on the device (replacing libsais' sequential
SA-IS) and queries run as batched lower/upper-bound probes over HBM-resident
(text, SA) chunks, sharded across a ``jax.sharding.Mesh`` at scale.
"""

from .api import Reader, Writer

__all__ = ['Reader', 'Writer']
__version__ = '0.1.0'
