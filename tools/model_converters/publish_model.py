#!/usr/bin/env python
"""Publish a checkpoint: strip optimizer state + hash-suffix the name.

Re-provides the reference's publish_model.py for orbax checkpoints.
"""
import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), '..', '..'))


def main():
    p = argparse.ArgumentParser(description='Publish a checkpoint')
    p.add_argument('in_ckpt')
    p.add_argument('out_ckpt')
    args = p.parse_args()
    from r3det_tpu.utils.checkpoint import publish_checkpoint
    final = publish_checkpoint(args.in_ckpt, args.out_ckpt)
    print(f'published -> {final}')


if __name__ == '__main__':
    main()
