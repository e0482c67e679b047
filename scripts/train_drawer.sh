#!/usr/bin/env bash
exec "$(dirname "$0")/train_all.sh" drawer "${1:-./data}"
