"""On-device clustering: DBSCAN + eps auto-selection.

TPU-native replacement for the reference's sklearn DBSCAN call and numpy eps
rule inlined in [selftraining.py] (SURVEY.md §3.1). Label semantics match
sklearn exactly (same labels up to nothing — identical ids, see dbscan.py),
which is the BASELINE.json pseudo-label parity requirement.
"""

from ssg_tpu.cluster.dbscan import dbscan
from ssg_tpu.cluster.eps import select_eps
