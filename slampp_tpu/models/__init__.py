"""Problem-type models (reference layer L7: SE2_Types.h, SE3_Types.h,
BA_Types.h, Sim3_Types.h, ROCV_Types.h).

Importing a model module registers its vertex/edge types in the global
registry; each module also exposes the auto-initializer functors used by the
parse loop.
"""

from slampp_tpu.models import se2  # noqa: F401
from slampp_tpu.models import se3  # noqa: F401
from slampp_tpu.models import ba  # noqa: F401
from slampp_tpu.models import sim3  # noqa: F401
from slampp_tpu.models import robust  # noqa: F401
from slampp_tpu.models import rocv  # noqa: F401
