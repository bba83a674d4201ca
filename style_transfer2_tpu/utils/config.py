"""Layered INI configuration, matching the reference's semantics.

The reference (utils.py:110-127) merges three config sources, later wins:
``config.ini`` -> ``config_non_git.ini`` -> an optional CLI-positional config
file, all keys living in one ``[DEFAULT]`` section, plus a counting
``--debug/-d`` flag whose value ADDS to the config's ``debug`` key.
"""

import argparse
import configparser
from pathlib import Path

# The repo root (two levels up from this file's package).
ROOT_DIR = Path(__file__).resolve().parents[2]
CONFIG_PATH = ROOT_DIR / 'config.ini'
CONFIG_PATH_NON_GIT = ROOT_DIR / 'config_non_git.ini'


def parse_args(desc='', argv=None):
    """Parses the standard CLI: one optional positional config path and a
    counting debug flag (reference utils.py:110-117)."""
    parser = argparse.ArgumentParser(description=desc)
    parser.add_argument('config', nargs='?', help='the config file')
    parser.add_argument('--debug', '-d', action='count', help='debug')
    args = parser.parse_args(argv)
    if not args.debug:
        args.debug = 0
    return args


def read_config(args=None, extra_paths=()):
    """Returns the merged [DEFAULT] section from the layered config files
    (reference utils.py:120-127). ``args`` may be the namespace from
    parse_args() or None."""
    cp = configparser.ConfigParser()
    configs = [str(CONFIG_PATH), str(CONFIG_PATH_NON_GIT)]
    configs.extend(str(p) for p in extra_paths)
    if args is not None and getattr(args, 'config', None):
        configs.append(args.config)
    cp.read(configs)
    return cp['DEFAULT']


def debug_level(args, config):
    """Combined debug level: CLI count + config key (reference app.py:393-395)."""
    level = config.getint('debug', 0)
    if args is not None:
        level += getattr(args, 'debug', 0)
    return level
