-- bug class: global writes from inside a masked call (round 2) — a
-- callee invoked under a lane mask that writes a global must have the
-- entry mask re-applied to the write (inactive lanes keep old values).
gacc = 0
function bump(v)
  gacc = gacc + v
  return gacc
end
function f(x, y)
  gacc = y
  local r = x
  if x > 0 then r = bump(x) end
  return r, gacc
end
