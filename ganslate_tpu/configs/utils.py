"""Config loading: YAML -> typed config tree.

Reference behavior being reproduced (`/root/reference/ganslate/configs/utils.py:10-91`):
1. load YAML;
2. import the experiment's project dir as a module named ``project`` so YAML
   ``_target_: project.X`` resolves to user code;
3. walk the YAML deepest-key-first and, for every node carrying ``_target_``,
   import ``<_target_>Config`` and merge that typed schema underneath the node;
4. merge the structured root ``Config`` schema with the YAML.

`_target_` strings beginning with ``ganslate.`` are transparently aliased to
this package (see `ganslate_tpu.utils.io.import_attr`) so reference experiment
YAMLs run unmodified.
"""

import importlib.util
import logging
import sys
from pathlib import Path

from ganslate_tpu.configs.omega import Conf
from ganslate_tpu.utils.io import import_attr

logger = logging.getLogger(__name__)


def init_config(conf, config_class):
    """Build the fully-typed config tree from a YAML path or Conf."""
    conf = conf if isinstance(conf, Conf) else Conf.load(str(conf))

    if conf.get("project"):
        import_project_as_module(conf.project)

    conf = instantiate_dataclasses_from_yaml(conf)
    conf = _apply_mode_schemas(conf)
    return Conf.merge(Conf.structured(config_class), conf)


def _apply_mode_schemas(conf: Conf) -> Conf:
    """Merge the typed per-mode schemas under Optional mode sections.

    The root `Config` declares val/test/infer as Optional (default None), so
    the structured-root merge alone cannot supply their dataclass defaults;
    OmegaConf used static field types for this, here we resolve them
    explicitly."""
    from ganslate_tpu.configs.inference import InferenceConfig
    from ganslate_tpu.configs.validation_testing import TestConfig, ValidationConfig

    for key, schema in (("val", ValidationConfig), ("test", TestConfig),
                        ("infer", InferenceConfig)):
        if key in conf and conf.raw()[key] is not None:
            conf.update(key, Conf.merge(Conf.structured(schema), conf[key]))
    return conf


def import_project_as_module(project_dir):
    """Import a project directory as the module named ``project``."""
    assert isinstance(project_dir, str), "project needs to be a str path"

    project_path = Path(project_dir).resolve() / "__init__.py"
    assert project_path.is_file(), f"No `__init__.py` in project `{project_path}`."

    # Purge any previously-loaded project (and its submodules) so different
    # projects can be loaded in one process without stale module collisions.
    for name in [m for m in sys.modules if m == "project" or m.startswith("project.")]:
        del sys.modules[name]

    spec = importlib.util.spec_from_file_location(
        "project", str(project_path),
        submodule_search_locations=[str(project_path.parent)])
    project_module = importlib.util.module_from_spec(spec)
    sys.modules["project"] = project_module
    spec.loader.exec_module(project_module)

    logger.info(f"Project directory {project_dir} imported as module `project`.")


def instantiate_dataclasses_from_yaml(conf: Conf) -> Conf:
    """For every `_target_`-keyed node (deepest first), merge its typed schema
    (the `<_target_>Config` dataclass) underneath the YAML values."""
    for key in get_all_conf_keys(conf):
        node = conf.select(key)
        if is_dataclass_node(node):
            schema = init_dataclass(node)
            conf.update(key, Conf.merge(schema, node))
    return conf


def init_dataclass(node) -> Conf:
    """Import `<_target_>Config` and return it as a structured Conf."""
    dataclass_name = f'{node["_target_"]}Config'
    dataclass = import_attr(dataclass_name)
    return Conf.structured(dataclass)


def is_dataclass_node(node) -> bool:
    return isinstance(node, Conf) and "_target_" in node


def get_all_conf_keys(conf: Conf):
    """All dotted keys, ordered deepest to shallowest."""
    container = conf.to_container(resolve=False)
    keys = list(iterate_nested_dict_keys(container))
    return keys[::-1]


def iterate_nested_dict_keys(dictionary):
    """Yield dotted keys of a nested dict, shallowest first."""
    if isinstance(dictionary, dict):
        current_level_keys = list(dictionary.keys())
        for key in current_level_keys:
            yield key
        for key in current_level_keys:
            for sub in iterate_nested_dict_keys(dictionary[key]):
                yield f"{key}.{sub}"
