"""Host-side alias for ca3d content generation (re-export for the voxel
content path; the implementation lives with the CA kernels)."""
from ..ops.ca3d import ca3d_make_np as ca3d_make_host  # noqa: F401
