#!/usr/bin/env bash
exec "$(dirname "$0")/train_all.sh" oven "${1:-./data}"
