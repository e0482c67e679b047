#!/usr/bin/env bash
exec "$(dirname "$0")/train_all.sh" eyeglasses "${1:-./data}"
