"""Console-script entry points (pyproject [project.scripts]).

Every CLI module's ``main(argv=None)`` returns a rich object — the final
TrainState, a metrics dict — for programmatic use (tests, notebooks, the
reproduce_tables tool). setuptools script wrappers run ``sys.exit(main())``,
which would print that object's repr to stderr and exit non-zero after a
successful run, so the installed commands route through these shims, which
execute the same main and discard the return value. Imports are lazy: a
``synergy-port --help`` must not pay the JAX/flax import cost of the trainer.
"""

import importlib


def _shim(target: str):
    mod_name, func_name = target.split(":")

    def run(argv=None):
        getattr(importlib.import_module(mod_name), func_name)(argv)
        return 0

    run.__doc__ = f"Console entry point for {target} (return value discarded)."
    return run


pretrain = _shim("synergy_tpu.train.pretrain:main")
mmr = _shim("synergy_tpu.train.mmr:main")
serve = _shim("synergy_tpu.serve:main")
port = _shim("synergy_tpu.interop.port_cli:main")
export = _shim("synergy_tpu.interop.export_cli:main")
ft_image = _shim("synergy_tpu.eval.ft_image:main")
ft_audio = _shim("synergy_tpu.eval.ft_audio:main")
ft_text = _shim("synergy_tpu.eval.ft_text:main")
zs_image = _shim("synergy_tpu.eval.zs_image:main")
zs_audio = _shim("synergy_tpu.eval.zs_audio:main")
zs_task = _shim("synergy_tpu.eval.zs_task:main")
