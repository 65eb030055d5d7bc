"""Engine dispatch (reference parity: /root/reference/ganslate/engines/utils.py)."""

from ganslate_tpu.utils import communication, environment
from ganslate_tpu.utils.builders import build_conf


def init_engine(mode, dotlist_args):
    from ganslate_tpu.engines.inferer import Inferer
    from ganslate_tpu.engines.trainer import Trainer
    from ganslate_tpu.engines.validator_tester import Tester

    engines = {"train": Trainer, "test": Tester, "infer": Inferer}
    assert mode in engines

    communication.init_distributed()
    environment.setup_threading()

    conf = build_conf(dotlist_args)
    return engines[mode](conf)
