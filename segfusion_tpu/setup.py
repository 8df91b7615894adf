"""Factory facade: the reference's `utils.setup` namespace in one place
(reference utils/setup.py:29-274), re-exporting this framework's typed
factories."""

from .config import get_data_config  # noqa: F401
from .core.database import Database
from .data import get_data  # noqa: F401
from .data.augmentations import get_composed_augmentations  # noqa: F401
from .utils.losses import get_loss_function  # noqa: F401
from .utils.optim import get_optimizer  # noqa: F401
from .utils.schedulers import get_schedule as get_scheduler  # noqa: F401
from .utils.workspace import Workspace, get_workspace  # noqa: F401


def get_database(dataset, data_config) -> Database:
    """Reference utils/setup.py:80-85."""
    return Database(dataset, data_config)
