#!/usr/bin/env bash
exec "$(dirname "$0")/train_all.sh" laptop "${1:-./data}"
