#!/bin/bash
for cfg in "::" "full:512:" "full:256:" "full:1024:" ":256:" "full:2048:"; do
  IFS=':' read -r TN TK _ <<< "$cfg"
  echo "=== TN=${TN:-auto} TK=${TK:-auto} ==="
  TURBOINFER_QMM_TN=$TN TURBOINFER_QMM_TK=$TK timeout 400 python _bench7b.py 0 2>&1 | grep -E "PALLAS|REF" 
done
