#!/usr/bin/env python
"""Training-log analysis: loss curves + iteration-time statistics.

Re-provides the reference's analyze_logs.py over this framework's
train_log.jsonl (one JSON record per log interval).
"""
import argparse
import json

import numpy as np


def load_log(path):
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def cmd_plot(args):
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    for path in args.json_logs:
        recs = load_log(path)
        for key in args.keys:
            xs = [r['step'] for r in recs if key in r]
            ys = [r[key] for r in recs if key in r]
            plt.plot(xs, ys, label=f'{path}:{key}')
    plt.xlabel('step')
    plt.legend()
    plt.savefig(args.out)
    print(f'plot -> {args.out}')


def cmd_time(args):
    for path in args.json_logs:
        recs = load_log(path)
        ips = np.array([r['imgs_per_sec'] for r in recs
                        if 'imgs_per_sec' in r])
        if not len(ips):
            print(f'{path}: no throughput records')
            continue
        print(f'{path}: mean {ips.mean():.2f} img/s  '
              f'fastest {ips.max():.2f}  slowest {ips.min():.2f}  '
              f'({len(ips)} records)')


def main():
    p = argparse.ArgumentParser(description='Analyze train logs')
    sub = p.add_subparsers(dest='cmd', required=True)
    pp = sub.add_parser('plot_curve')
    pp.add_argument('json_logs', nargs='+')
    pp.add_argument('--keys', nargs='+', default=['total'])
    pp.add_argument('--out', default='curve.png')
    pt = sub.add_parser('cal_train_time')
    pt.add_argument('json_logs', nargs='+')
    args = p.parse_args()
    {'plot_curve': cmd_plot, 'cal_train_time': cmd_time}[args.cmd](args)


if __name__ == '__main__':
    main()
