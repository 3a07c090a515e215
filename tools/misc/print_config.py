#!/usr/bin/env python
"""Print the fully-merged config (and the derived DetectorConfig)."""
import argparse
import os.path as osp
import pprint
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), '..', '..'))


def main():
    p = argparse.ArgumentParser(description='Print resolved config')
    p.add_argument('config')
    p.add_argument('--cfg-options', nargs='+', default=[])
    args = p.parse_args()
    from r3det_tpu.utils.config import Config
    from r3det_tpu.utils.builder import detector_config_from_dict
    cfg = Config.fromfile(args.config)
    cfg.merge_from_options(dict(kv.split('=', 1) for kv in args.cfg_options))
    pprint.pprint(cfg.to_dict())
    if 'model' in cfg:
        print('\nDerived DetectorConfig:')
        pprint.pprint(detector_config_from_dict(
            cfg.model.to_dict())._asdict())


if __name__ == '__main__':
    main()
