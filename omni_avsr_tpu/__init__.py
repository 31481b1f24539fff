"""omni-avsr-tpu: TPU-native re-design of Omni-AVSR (see SURVEY.md).

`OMNI_PROFILE=reference` pins every numerics toggle to the reference-exact
combination in one place (utils/profiles.py) — applied here, before any
submodule samples its env var at import time.
"""

import os as _os

if _os.environ.get("OMNI_PROFILE"):
    from .utils.profiles import apply_profile as _apply_profile

    _apply_profile()
