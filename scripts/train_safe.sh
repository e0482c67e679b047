#!/usr/bin/env bash
exec "$(dirname "$0")/train_all.sh" safe "${1:-./data}"
