-- late round 3 (code review): a bool lane array (comparison result)
-- compared with == against a bool must be ELEMENTWISE, not the
-- uniform-False mixed-type rule.
function f(x, y)
  local b = (x > 0) == true
  local c = (y < 0) ~= false
  if b then return x * 2, y end
  if c then return x, y * 2 end
  return x, y
end
